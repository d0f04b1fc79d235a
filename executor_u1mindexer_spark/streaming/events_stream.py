"""Structured Streaming event pipeline.

readStream(parquet) → watermark → windowed aggregation → memory/parquet sink.
The aggregation bodies are the SAME expressions as the batch builders in
operators/events.py, so batch results are the oracle for the streaming path
(tested in tests/test_streaming.py with trigger(availableNow=True)).

Scale notes: watermark bounds state (late events beyond the watermark are
dropped); availableNow processes a backlog in bounded batches — the same
program serves both the 100 TB backfill (batch) and the live tail.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def read_fixture_stream(
    spark: SparkSession, sf_dir: str, table: str, max_files: int = 1
) -> DataFrame:
    """File-source stream over one fixture table: probe the physical schema
    with a batch read (schemas are mandatory for file streams), then stream
    the fixture dir with a glob filter selecting just that table's file.
    Shared scaffold for every streaming twin (events, documents, ...)."""
    phys = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet")).schema
    return (
        spark.readStream.schema(phys)
        .option("maxFilesPerTrigger", max_files)
        .option("pathGlobFilter", f"{table}.parquet")
        .parquet(sf_dir)
    )


def read_events_stream(spark: SparkSession, sf_dir: str, max_files: int = 1) -> DataFrame:
    """Events stream = the shared fixture reader + the events-specific ts
    normalization: the fixture's ts column has shipped both as
    TIMESTAMP(NANOS) (read as int64 nanos via nanosAsLong) and as plain
    timestamp[us]; convert exactly like tables.load so the streaming twin
    always matches the batch oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = read_fixture_stream(spark, sf_dir, "events", max_files)
    if isinstance(raw.schema["ts"].dataType, LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # watermarks require TIMESTAMP (ltz) — with a UTC session tz (session.py)
    # the wall-clock values match the batch path's timestamp_ntz exactly
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def streaming_tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts per event_type — the streaming twin
    of operators/events.tumbling_window."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def streaming_sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Watermarked session windows per user — the streaming twin of
    operators/events.sessionize (native session_window state merge)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, key: str = "event_id") -> DataFrame:
    """Streaming exact dedup: dropDuplicates within the watermark horizon —
    the streaming twin of operators/dedup.exact_dedup (state = one entry per
    key, expired once the watermark passes)."""
    return events.withWatermark("ts", "1 hour").dropDuplicates([key])


def streaming_purchase_view_join(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: purchases x views of the same user with
    the view in the hour before the purchase. Both sides watermarked so the
    join state is bounded (Spark buffers each side only until watermark +
    interval)."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    return purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") > F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("purchase_id", "user_id", "purchase_ts", "view_ts")


def run_available_now(sdf: DataFrame, table_name: str, output_mode: str = "complete") -> None:
    """Drain the whole backlog into an in-memory sink (bounded test runs)."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
