"""Streaming twin of exact dedup — the ingest-time dedup ledger.

readStream(parquet documents) → content hash → streaming grouped aggregate
(keep-id = min doc_id, copy count) in complete mode. The aggregation body is
the SAME (hash, min, count) triple as ``operators/dedup.exact_dedup``'s
batch formulation, so the batch result is the oracle (tested in
tests/test_streaming.py with trigger(availableNow=True)).

Scale notes: the streaming state is one row per distinct content hash —
bounded by UNIQUE content, not by stream length; duplicate arrivals fold
into the existing state row (min/count are monotone, so state updates are
O(1) per record). For an unbounded stream where even unique-content state
must be bounded, the production layout is dropDuplicatesWithinWatermark on
an event-time column + the periodic batch compaction (exact_dedup) over the
sealed partitions — the same split as the engine's LSM docstore: streaming
handles the tail, batch seals history. [NOT IN REFERENCE — executor.py has
no streaming surface.]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from executor_u1mindexer_spark.operators.dedup import content_hash
from executor_u1mindexer_spark.streaming.events_stream import read_fixture_stream


def read_documents_stream(
    spark: SparkSession, sf_dir: str, max_files: int = 1
) -> DataFrame:
    """Documents stream via the shared fixture reader (no per-table
    normalization needed — the documents schema streams as-is)."""
    return read_fixture_stream(spark, sf_dir, "documents", max_files)


def streaming_exact_dedup_ledger(docs: DataFrame) -> DataFrame:
    """Streaming grouped dedup ledger: per content hash, the id to keep
    (lowest seen) and how many copies arrived. Complete-mode output; the
    batch twin is exact_dedup's (keep_id, text_hash, n_copies)."""
    return (
        docs.select(F.col("doc_id"), content_hash("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# -- streaming NEAR-dedup (MinHash-LSH) --------------------------------------
#
# Ingest-time near-duplicate detection: signatures and band keys are the
# SAME Catalyst expressions as the batch path (operators/dedup), computed
# scan-side per micro-batch; the stateful part is keyed by LSH bucket
# (band_idx, band_key) via applyInPandasWithState. Each bucket's state is
# the (doc_id, signature) list of docs seen in that bucket — bounded by
# bucket occupancy (r=4 banding keeps buckets small; the batch path's
# bounded-bucket argument, dedup.py:225-229, carries over verbatim). A new
# arrival is compared against the bucket's earlier docs by signature
# agreement (fraction of equal perms, the standard MinHash estimate of
# jaccard); matches emit a (doc_id, dup_of, band_idx, sim) decision row
# with dup_of = the SMALLEST earlier qualifying id (deterministic). A doc
# may collide in several bands — the consumer takes min(dup_of) per doc
# (one tiny batch agg over the decision ledger), mirroring how the batch
# path dedups its banded candidates. Confirm-by-signature (not exact
# shingle jaccard) is the deliberate streaming trade: state holds 32
# longs/doc/bucket instead of unbounded shingle sets; the estimator's
# bias vs exact jaccard is the documented cost of bounded state.
# [NOT IN REFERENCE — no streaming surface in executor.py.]

SIG_SIM_THRESHOLD = 0.5  # >= 16 of 32 perms agree


def _sig_sim(a: list, b: list) -> float:
    return sum(1 for x, y in zip(a, b) if x == y) / float(len(a))


def _bucket_dedup_kernel(key, pdfs, state):
    """Per-bucket stateful comparator. Batch rows are processed in doc_id
    order (deterministic within a micro-batch); 'earlier' = bucket state
    from prior batches, then smaller ids in this batch."""
    import pandas as pd

    if state.exists:
        ids, sigs = list(state.get[0]), [list(s) for s in state.get[1]]
    else:
        ids, sigs = [], []
    out = {"doc_id": [], "dup_of": [], "band_idx": [], "sim": []}
    band_idx = int(key[0])
    batch = pd.concat(list(pdfs)).sort_values("doc_id")
    for doc_id, sig in zip(batch["doc_id"], batch["sig"]):
        sig = [int(v) for v in sig]
        best, best_sim = None, 0.0
        for eid, esig in zip(ids, sigs):
            sim = _sig_sim(sig, esig)
            if sim >= SIG_SIM_THRESHOLD and (best is None or eid < best):
                best, best_sim = eid, sim
        if best is not None:
            out["doc_id"].append(int(doc_id))
            out["dup_of"].append(best)
            out["band_idx"].append(band_idx)
            out["sim"].append(best_sim)
        ids.append(int(doc_id))
        sigs.append(sig)
    state.update((ids, sigs))
    yield pd.DataFrame(out)


def streaming_minhash_dedup(docs: DataFrame) -> DataFrame:
    """Per-bucket near-duplicate decision ledger over a document stream
    (update output mode): (doc_id, dup_of, band_idx, sim) whenever a new
    doc's signature agrees with an earlier same-bucket doc on >=
    SIG_SIM_THRESHOLD of the perms."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from executor_u1mindexer_spark.operators.dedup import (
        lsh_band_keys,
        minhash_signature,
    )

    banded = docs.select(
        F.col("doc_id"),
        minhash_signature("text").alias("sig"),
    ).select(
        "doc_id",
        "sig",
        F.posexplode(lsh_band_keys(F.col("sig"))).alias("band_idx", "band_key"),
    )
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("dup_of", LongType()),
            StructField("band_idx", IntegerType()),
            StructField("sim", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ids", ArrayType(LongType())),
            StructField("sigs", ArrayType(ArrayType(LongType()))),
        ]
    )
    return banded.groupBy("band_idx", "band_key").applyInPandasWithState(
        _bucket_dedup_kernel,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
