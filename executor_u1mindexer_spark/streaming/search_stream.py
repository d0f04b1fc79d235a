"""Streaming twin of the flagship /search endpoint (reference
executor.py:73-125): a stream of query vectors scored against the STATIC
indexed corpus, micro-batch by micro-batch.

Shape: readStream(queries) → foreachBatch(knn_search against the static
corpus) → append sink. foreachBatch is the right (and only) form for
top-k: a per-query rank window over an unaggregated stream is unsupported
by Structured Streaming, while inside foreachBatch each micro-batch is a
plain DataFrame, so the EXACT batch operator — broadcast queries, BNLJ,
WindowGroupLimit top-k (operators/knn.py) — runs unchanged and the batch
path stays the oracle (tested in tests/test_streaming.py).

Scale notes: the static corpus is scanned per micro-batch (the
stream-side broadcast keeps the 100 TB side un-shuffled, same plan as
batch); exactly-once lands on the checkpoint + per-batch-id idempotent
append the file sink provides. trigger(availableNow) drains a backlog in
bounded batches — the same program serves backfill and live tail, like
the events pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from executor_u1mindexer_spark.operators import knn


def run_streaming_search(
    query_stream: DataFrame,
    corpus: DataFrame,
    sink_path: str,
    checkpoint: str,
    *,
    k: int = 20,
    metric: str = "cosine",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
    payload: DataFrame | None = None,
):
    """Start the streaming search; returns the StreamingQuery handle.

    Each micro-batch of queries runs the batch knn_search against the
    static corpus and appends (batch_id, query_id, vec_id, rank, score
    [, payload columns]) to the parquet sink."""

    def score(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        out = knn.knn_search(
            corpus,
            batch_df,
            k=k,
            metric=metric,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
            payload=payload,
        )
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            sink_path
        )

    return (
        query_stream.writeStream.foreachBatch(score)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
