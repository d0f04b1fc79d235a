"""applyInPandasWithState: final streamed state equals the batch aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from executor_u1mindexer_spark import tables
from executor_u1mindexer_spark.streaming import events_stream as S
from executor_u1mindexer_spark.streaming.stateful import streaming_user_profiles


def test_stateful_profiles_match_batch(spark, sf_dir):
    stream = S.read_events_stream(spark, sf_dir)
    q = (
        streaming_user_profiles(stream)
        .writeStream.format("memory")
        .queryName("user_profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per key per micro-batch; the LAST row per
    # key is the final state (single source file => one batch here)
    got = {
        r.user_id: (r.n_events, round(r.sum_value, 6), r.last_ts)
        for r in spark.table("user_profiles").collect()
    }
    ev = tables.load(spark, sf_dir, "events")
    want = {
        r.user_id: (r.n_events, round(r.sum_value, 6), r.last_ts)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert got == want and len(got) > 0
