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
batch); exactly-once = checkpoint + an IDEMPOTENT per-batch write — each
micro-batch overwrites its own batch_id=<n> partition directory, so a
replayed batch (failure after the parquet commit but before the
checkpoint records it) rewrites the same directory instead of appending
duplicates. trigger(availableNow) drains a backlog in bounded batches —
the same program serves backfill and live tail, like the events
pipeline.
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
    static corpus and writes (query_id, vec_id, rank, score [, payload
    columns]) into the sink's batch_id=<n> partition directory (read the
    sink root and batch_id comes back as a partition column). Overwriting
    the batch's OWN directory makes replays idempotent — see module
    docstring."""

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
        out.write.mode("overwrite").parquet(f"{sink_path}/batch_id={batch_id}")

    return (
        query_stream.writeStream.foreachBatch(score)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
