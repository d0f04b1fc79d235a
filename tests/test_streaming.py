"""Streaming twins produce the same answers as the batch operators —
batch is the oracle for the streaming path."""

from __future__ import annotations

from pyspark.sql import functions as F

from executor_u1mindexer_spark import tables
from executor_u1mindexer_spark.operators import events as E
from executor_u1mindexer_spark.streaming import events_stream as S


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    stream = S.read_events_stream(spark, sf_dir)
    S.run_available_now(S.streaming_tumbling_counts(stream), "stream_tumbling")
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.table("stream_tumbling").collect()
    }
    ev = tables.load(spark, sf_dir, "events")
    want = {
        (r.window_start, r.event_type): r.n_events
        for r in E.tumbling_window(ev, "1 hour", keys=("event_type",)).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_sessionize_matches_batch(spark, sf_dir):
    stream = S.read_events_stream(spark, sf_dir)
    S.run_available_now(S.streaming_sessionize(stream), "stream_sessions")
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in spark.table("stream_sessions").collect()
    }
    ev = tables.load(spark, sf_dir, "events")
    want = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in E.sessionize(ev, "30 minutes").collect()
    }
    assert got == want and len(got) > 0


def test_streaming_is_incremental(spark, sf_dir):
    # the stream really is a stream (not a disguised batch read)
    stream = S.read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    assert E.tumbling_window(tables.load(spark, sf_dir, "events"), "1 hour").isStreaming is False
