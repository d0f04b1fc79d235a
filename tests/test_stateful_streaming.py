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


def test_streaming_rolling_zscore_matches_batch(spark, sf_dir):
    """Single-batch drain: the stateful stream's per-event anomaly flags
    must BIT-EQUAL the batch operator's (same cross-multiplied integer
    test, baseline-excludes-current semantics)."""
    from executor_u1mindexer_spark.operators.pipeline import rolling_zscore_anomaly
    from executor_u1mindexer_spark.streaming.anomaly_stream import (
        streaming_rolling_zscore,
    )

    stream = S.read_events_stream(spark, sf_dir)
    q = (
        streaming_rolling_zscore(stream)
        .writeStream.format("memory")
        .queryName("rolling_zscore")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.event_id: (r.v_scaled, r.n_win, r.is_anomaly)
        for r in spark.table("rolling_zscore").collect()
    }
    ev = tables.load(spark, sf_dir, "events")
    want = {
        r.event_id: (r.v_scaled, r.n_win, r.is_anomaly)
        for r in rolling_zscore_anomaly(
            ev, key="user_id", order_cols=("ts", "event_id"),
            value_col="value", id_col="event_id",
        ).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_streaming_zscore_state_carry_across_chunks():
    """Pure-python core: folding events in two chunks (micro-batches)
    equals folding them in one — the state string carries exactly the
    trailing window; eviction is bounded at window_rows."""
    from executor_u1mindexer_spark.streaming.anomaly_stream import apply_chunk

    events = [(i, float(10 + (i * 7) % 5)) for i in range(30)] + [(30, 99.0)]
    vals_a, out_a = apply_chunk([], events, window_rows=8)
    half = 17
    vals_b, out_1 = apply_chunk([], events[:half], window_rows=8)
    vals_b, out_2 = apply_chunk(vals_b, events[half:], window_rows=8)
    assert out_a == out_1 + out_2
    assert vals_a == vals_b
    assert len(vals_a) == 8  # hard-bounded state
    assert out_a[-1][3] is True  # the 99.0 spike flags
