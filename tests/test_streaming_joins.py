"""Streaming dedup + stream-stream interval join vs their batch twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from executor_u1mindexer_spark import tables
from executor_u1mindexer_spark.streaming import events_stream as S


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir):
    stream = S.read_events_stream(spark, sf_dir)
    S.run_available_now(S.streaming_dedup(stream), "stream_dedup", output_mode="append")
    got = spark.table("stream_dedup").count()
    want = tables.load(spark, sf_dir, "events").dropDuplicates(["event_id"]).count()
    assert got == want > 0


def test_streaming_parquet_sink_with_checkpoint(spark, sf_dir, tmp_path):
    """Durable streaming sink: append-mode parquet + checkpoint dir; output
    read back equals the batch aggregate (watermark-closed windows only is
    moot here — availableNow drains everything, then the final windows
    flush on the terminal batch)."""
    from executor_u1mindexer_spark.operators import events as E
    from executor_u1mindexer_spark import tables as T

    stream = S.read_events_stream(spark, sf_dir)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        S.streaming_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir).count()
    want = T.load(spark, sf_dir, "events").dropDuplicates(["event_id"]).count()
    assert got == want > 0
    # restart on the same checkpoint: nothing new to process, no duplicates
    q2 = (
        S.streaming_dedup(S.read_events_stream(spark, sf_dir))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert spark.read.parquet(out_dir).count() == want  # exactly-once held


def test_stream_stream_join_matches_batch_range_join(spark, sf_dir):
    stream = S.read_events_stream(spark, sf_dir)
    S.run_available_now(
        S.streaming_purchase_view_join(stream), "stream_pv_join", output_mode="append"
    )
    got = {
        (r.purchase_id, r.view_ts) for r in spark.table("stream_pv_join").collect()
    }
    ev = tables.load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    want = {
        (r.purchase_id, r.view_ts)
        for r in p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (F.col("view_ts") > F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_asof_nearest_tie_and_boundary_semantics(spark):
    """asof_join_nearest edge semantics (r11): equal timestamps count in
    BOTH directions (<= and >=), exact-tie gaps resolve to the backward
    match, and one-sided keys return the available side — hand-built
    cases where every rule fires."""
    from datetime import datetime as DT

    from executor_u1mindexer_spark.operators import events as E

    def ts(m):
        return DT(2025, 1, 1, 12, m)

    left = spark.createDataFrame(
        [(1, 10, ts(30)),   # equal-ts right exists -> both sides = 12:30
         (2, 20, ts(30)),   # right at 12:20 and 12:40 -> exact tie -> backward
         (3, 30, ts(30)),   # right only before
         (4, 40, ts(30)),   # right only after
         (5, 50, ts(30))],  # no right at all
        "u long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(30)),
         (2, ts(20)), (2, ts(40)),
         (3, ts(25)),
         (4, ts(35))],
        "u long, ts timestamp",
    )
    got = {r.event_id: (r.before_ts, r.after_ts, r.nearest_ts)
           for r in E.asof_join_nearest(left, right, on="u").collect()}
    assert got[10] == (ts(30), ts(30), ts(30))
    assert got[20] == (ts(20), ts(40), ts(20))   # tie -> backward
    assert got[30] == (ts(25), None, ts(25))
    assert got[40] == (None, ts(35), ts(35))
    assert got[50] == (None, None, None)
