"""Similarity-search operators — the scale paths beyond brute-force KNN.

operators/knn.py is the exact O(n·q) baseline (broadcast + codegen — right
answer, embarrassingly parallel). These operators add the sub-linear
strategies a 100 TB corpus needs:

- IVF-style bucketed search: a coarse partitioner (here the fixture `label`;
  in production a k-means assignment) restricts each query to its cell —
  n^2/cells work, one shuffle on the cell key.
- Sign-LSH (random hyperplanes): hash vectors to sign-bit buckets, search
  only within the bucket. Planes are fixed module constants (seeded numpy)
  so results are deterministic and oracle-checkable.
- Partitioned top-k merge: per-partition exact top-k via Arrow-batched
  applyInPandas (numpy argpartition — the vectorized stand-in for a
  per-partition hnswlib index build, reference executor.py:112), then a
  global window merge. The map side emits only k rows per (query,
  partition), so the shuffle is tiny regardless of corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from executor_u1mindexer_spark.functions import vector as V

# Fixed hyperplanes for sign-LSH (seeded — NOT query-time randomness).
N_PLANES = 4
EMBED_DIM = 64
_rng = np.random.RandomState(42)
PLANES: list[list[float]] = [
    [round(float(x), 6) for x in _rng.uniform(-1.0, 1.0, EMBED_DIM)] for _ in range(N_PLANES)
]


def sign_lsh_bucket(vec_col, planes: list[list[float]] | None = None):
    """Bucket id = integer of sign bits of <v, plane_i> (0..2^n_planes-1)."""
    planes = planes or PLANES
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bits.append(
            F.when(V.dot(vec_col, plane) >= 0, F.lit(2**i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def bucketed_topk(
    stored: DataFrame,
    queries: DataFrame,
    bucket_stored,
    bucket_query,
    *,
    k: int,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
) -> DataFrame:
    """Top-k restricted to matching buckets (IVF / LSH shared core).

    bucket_* are column expressions evaluated on each side; the join is an
    equi-join on the bucket key (shuffle-partitioned by bucket, or broadcast
    when the query side is small — Catalyst picks).
    """
    s = stored.select(
        F.col(id_col),
        V.as_double_array(vec_col).alias("__svec"),
        bucket_stored.alias("__bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        V.as_double_array(query_vec_col).alias("__qvec"),
        bucket_query.alias("__bucket"),
    )
    if metric == "cosine":
        # per-row norms before the join (same factoring as knn.knn_search)
        q = q.withColumn("__qn", V.norm(F.col("__qvec")))
        s = s.withColumn("__sn", V.norm(F.col("__svec")))
    joined = s.join(F.broadcast(q), on="__bucket")
    if metric == "cosine":
        dist = F.lit(1.0) - V.dot(F.col("__qvec"), F.col("__svec")) / (
            F.col("__qn") * F.col("__sn")
        )
    else:
        dist = V.distance(metric, F.col("__qvec"), F.col("__svec"))
    w = Window.partitionBy(query_id_col).orderBy(F.col("__dist").asc(), F.col(id_col).asc())
    return (
        joined.select(query_id_col, id_col, dist.alias("__dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", F.col("__dist").alias("dist"))
    )


def kmeans_ivf_topk(
    stored: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    n_cells: int = 8,
    max_iter: int = 5,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
) -> DataFrame:
    """True IVF: a seeded MLlib KMeans coarse quantizer assigns cells; each
    query searches only its own cell (the production form of the label-
    bucket demo — cells adapt to the data distribution).

    Training runs on the stored side (at 100 TB: fit on a sample, transform
    everything); seed fixed for reproducibility. No SQL oracle — the
    trained centroids aren't expressible in static SQL — so the driver
    records the rows-only check for this one.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    s_feat = stored.select(
        F.col(id_col),
        V.as_double_array(vec_col).alias("__svec"),
    ).withColumn("features", array_to_vector(F.col("__svec")))
    model = KMeans(k=n_cells, seed=42, maxIter=max_iter).fit(s_feat.select("features"))
    s_cells = model.transform(s_feat).select(
        id_col, "__svec", F.col("prediction").alias("__cell")
    )
    q_feat = queries.select(
        F.col(query_id_col),
        V.as_double_array(query_vec_col).alias("__qvec"),
    ).withColumn("features", array_to_vector(F.col("__qvec")))
    q_cells = model.transform(q_feat).select(
        query_id_col, "__qvec", F.col("prediction").alias("__cell")
    )
    joined = s_cells.join(F.broadcast(q_cells), on="__cell")
    dist = V.distance(metric, F.col("__qvec"), F.col("__svec"))
    w = Window.partitionBy(query_id_col).orderBy(F.col("__dist").asc(), F.col(id_col).asc())
    return (
        joined.select(query_id_col, id_col, dist.alias("__dist"), "__cell")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", F.col("__cell").alias("cell"))
    )


def partitioned_topk_merge(
    stored: DataFrame,
    queries_pdf: pd.DataFrame,
    *,
    k: int,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_partitions: int = 8,
) -> DataFrame:
    """Exact KNN via per-partition numpy top-k + global merge.

    The corpus is repartitioned into n_partitions; each partition computes
    its local top-k per query with one vectorized numpy pass over an Arrow
    batch (mapInPandas), emitting k rows/query/partition; a final window
    keeps the global top-k. This is the shape a per-partition ANN library
    build would use (hnswlib is not in this container; numpy argpartition
    is the exact, dependency-free stand-in — same merge topology).
    """
    spark = stored.sparkSession
    qids = queries_pdf["query_id"].to_numpy()
    qmat = np.stack(queries_pdf["query_embedding"].to_numpy()).astype(np.float64)
    bq = spark.sparkContext.broadcast((qids, qmat))

    out_schema = f"query_id long, {id_col} long, dist double"

    def local_topk(batches):
        qids_l, qmat_l = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # With hnswlib available, this is where a per-partition HNSW
            # index build + knn_query would replace the exact numpy pass
            # (reference executor.py:112); the merge topology is identical.
            if metric == "cosine":
                sim = mat @ qmat_l.T
                d = 1.0 - sim / (
                    np.linalg.norm(mat, axis=1)[:, None] * np.linalg.norm(qmat_l, axis=1)[None, :]
                )
            elif metric == "euclidean":
                d = ((mat[:, None, :] - qmat_l[None, :, :]) ** 2).sum(axis=2)
            else:  # inner_product
                d = 1.0 - mat @ qmat_l.T
            kk = min(k, len(ids))
            part = np.argpartition(d, kk - 1, axis=0)[:kk]  # (kk, n_queries)
            rows = {
                "query_id": np.repeat(qids_l, kk),
                id_col: ids[part.T.ravel()],
                "dist": np.take_along_axis(d, part, axis=0).T.ravel(),
            }
            yield pd.DataFrame(rows)

    local = (
        stored.select(id_col, vec_col)
        .repartition(n_partitions)
        .mapInPandas(local_topk, schema=out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col(id_col).asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "dist")
    )
