"""Exact top-k nearest-neighbor search — the flagship operator.

Reference semantics (executor.py:73-125, the `/search` endpoint): for each
query vector, return the k nearest stored vectors under the configured
metric (executor.py:112 `knn_query`), attach the FULL stored row for every
match (executor.py:116, README.md:14 "Always return full Documents"), apply
the optional distance→similarity transform (executor.py:117-124), clamp k
to the active index size (executor.py:97-102), and validate embedding width
(executor.py:105-110).

Spark-first design (no port of the HNSW graph):
- The query set is small relative to the corpus → `F.broadcast(queries)`
  + cross join = a broadcast nested-loop join. Each executor scans only its
  partitions of the stored vectors against an in-memory copy of the
  queries: embarrassingly parallel, no shuffle of the big side, scales
  linearly with executors at 100 TB.
- Distance = higher-order array functions (zip_with/aggregate) → stays in
  whole-stage codegen (the Tungsten answer to the reference's C++ kernel).
- Per-query top-k = row_number window, partitioned by query id. Spark's
  WindowGroupLimit (3.5+) pushes the rank-limit into a per-partition top-k
  heap before the shuffle, so only ~k rows per query per partition move.
- Ties broken on stored id so results are deterministic across partition
  orders (floats are folded in fixed order — see functions/vector.py).
- Exact search ⇒ recall 1.0; the reference's ef/M recall knobs
  (executor.py:22-24) have no exact-path equivalent. For corpora where a
  sub-linear batch path matters, see operators/similarity.py (LSH / IVF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from executor_u1mindexer_spark.functions import vector as V

DEFAULT_K = 20  # reference default `limit: int = 20` (executor.py:19)


def knn_search(
    stored: DataFrame,
    queries: DataFrame,
    *,
    k: int = DEFAULT_K,
    metric: str = "cosine",
    is_distance: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
    payload: DataFrame | None = None,
    payload_key: str = "doc_id",
) -> DataFrame:
    """Top-k exact KNN of each query against the stored vector table.

    Returns one row per (query, match) with columns
    (query_id, vec_id, rank, score) plus all payload columns when a payload
    DataFrame is given (the executor.py:116 full-Document fetch).

    `k` is clamped to the stored count at plan-build time only if the caller
    asks (see `clamped_k`); Spark's rank filter naturally returns fewer rows
    when the corpus is smaller than k — same observable behavior as the
    reference's clamp (executor.py:97-102).
    """
    q = queries.select(
        F.col(query_id_col),
        V.as_double_array(query_vec_col).alias("__qvec"),
    )
    s = stored.select(
        F.col(id_col),
        V.as_double_array(vec_col).alias("__svec"),
    )
    if metric == "cosine":
        # norms once per ROW before the join, not once per PAIR inside the
        # distance expression (q queries x n vectors would fold each norm
        # q times); the arithmetic 1 - dot/(qn*sn) is bit-identical to
        # V.cosine_distance, just factored out of the pair loop.
        q = q.withColumn("__qn", V.norm(F.col("__qvec")))
        s = s.withColumn("__sn", V.norm(F.col("__svec")))

    # Broadcast the small query side; BNL join keeps the corpus un-shuffled.
    joined = s.crossJoin(F.broadcast(q))
    if metric == "cosine":
        dist = F.lit(1.0) - V.dot(F.col("__qvec"), F.col("__svec")) / (
            F.col("__qn") * F.col("__sn")
        )
    else:
        dist = V.distance(metric, F.col("__qvec"), F.col("__svec"))
    scored = joined.select(
        query_id_col,
        id_col,
        dist.alias("__dist"),
    )

    w = Window.partitionBy(query_id_col).orderBy(F.col("__dist").asc(), F.col(id_col).asc())
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))
        .select(
            query_id_col,
            id_col,
            "rank",
            V.score_transform(metric, F.col("__dist"), is_distance).alias("score"),
        )
    )

    if payload is not None:
        # executor.py:116 — every match carries the full stored row.
        topk = topk.join(payload, on=topk[id_col] == payload[payload_key], how="inner").drop(
            payload_key
        )
    return topk


def validate_dim(df: DataFrame, dim: int, vec_col: str = "embedding") -> None:
    """Raise ValueError if any row's embedding width != dim.

    Relational form of the reference's dim check (executor.py:105-110,
    144-148, 199-204). One aggregate scan; at 100 TB this is a single
    codegen'd pass with a count accumulator, no shuffle.
    """
    bad = df.filter(~V.dim_check(F.col(vec_col), dim)).limit(1).count()
    if bad:
        raise ValueError(
            f"Attempted to process vectors whose dimension != the index dim ({dim})"
        )


def clamped_k(stored: DataFrame, k: int) -> int:
    """k clamped to the stored-table size (executor.py:97-102).

    Driver-side count — only used when the caller wants the reference's
    warning semantics; the rank filter already degrades gracefully.
    """
    total = stored.count()
    return min(k, total)
