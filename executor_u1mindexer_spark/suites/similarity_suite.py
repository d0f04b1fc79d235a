"""Similarity-search suite: brute-force baseline + the bucketed scale paths
(IVF-by-label, sign-LSH hyperplanes, partitioned numpy top-k merge).

Oracle notes: bucketed variants replicate bucket assignment bit-for-bit in
SQL (the hyperplanes are inlined literal arrays, fold order identical).
The partitioned-merge variant omits `dist` from its output: the numpy
kernel's SIMD summation differs from the sequential fold at the last bit,
but the RANKING is identical on this data — rank-only output keeps the
oracle exact while the kernel stays vectorized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from executor_u1mindexer_spark import tables
from executor_u1mindexer_spark.operators import knn, similarity as S
from executor_u1mindexer_spark.functions import vector as V

K = 5
QUERY_MOD = 100  # queries = every 100th vec_id (deterministic, sf-scalable)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "embeddings")


def _queries(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
        F.col("label").alias("query_label"),
    )


def ann_cosine_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force vector-vector similarity join (the exact baseline)."""
    emb = _emb(spark, sf_dir)
    return knn.knn_search(emb, _queries(emb), k=K, metric="cosine")


def ann_ivf_label_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style: the coarse cell is the fixture label — each query scans
    only its own cell (n/cells of the corpus)."""
    emb = _emb(spark, sf_dir)
    return S.bucketed_topk(
        emb,
        _queries(emb),
        bucket_stored=F.col("label"),
        bucket_query=F.col("query_label"),
        k=K,
        metric="cosine",
    )


def ann_lsh_hyperplane_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH: 4 fixed hyperplanes -> 16 buckets; search within bucket."""
    emb = _emb(spark, sf_dir)
    q = _queries(emb)
    return S.bucketed_topk(
        emb,
        q,
        bucket_stored=S.sign_lsh_bucket(
            F.col("embedding").cast("array<double>")
        ),
        bucket_query=S.sign_lsh_bucket(
            F.col("query_embedding").cast("array<double>")
        ),
        k=K,
        metric="cosine",
    )


def ann_partitioned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition numpy top-k + window merge (rank-only output; see
    module docstring). Query side stays a DataFrame — no driver collect."""
    emb = _emb(spark, sf_dir)
    q = _queries(emb).select("query_id", "query_embedding")
    return S.partitioned_topk_merge(emb, q, k=K, metric="cosine").select(
        "query_id", "vec_id", "rank"
    )


def ann_kmeans_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-adaptive IVF (seeded MLlib KMeans quantizer) reduced to a
    deterministic invariant row so the driver gets a HARD check instead of
    the rows-only fallback (the trained centroids aren't expressible in
    static SQL, but these facts about the result are):

    - n_queries / n_results: every query returns exactly K rows (a query
      vector is a corpus member and probes 2 cells, so its candidate set
      is never short — nprobe=1 ran 4 results short at sf0.1);
    - per_query_k_ok / cell_consistent: each query's matches come from at
      most n_probe=2 cells (the multi-probe IVF contract);
    - recall_floor_ok: total overlap with the exact-KNN top-K is >= 6
      (nprobe=2 measures 19 of 25 at sf0.01, seed=42, up from 10 at
      nprobe=1 — the floor keeps >3x slack).

    The per-row output shape stays covered by tests/test_dedup_similarity.py
    against operators/similarity.kmeans_ivf_topk directly."""
    emb = _emb(spark, sf_dir)
    q = _queries(emb).select("query_id", "query_embedding")
    ivf = S.kmeans_ivf_topk(emb, q, k=K, n_probe=S.N_PROBE)
    exact = knn.knn_search(emb, q, k=K, metric="cosine").select("query_id", "vec_id")
    # r16 one-pass hit counting (see eval_ann_recall_at_k): broadcast LEFT
    # join against the hit-flagged exact set + count of non-null flags,
    # instead of a semi-join branch that re-evaluated the retrieval
    # subtree; exact is unique per (query_id, vec_id) so no row multiplies
    # and a hitless query naturally counts h = 0 (the old fillna lane).
    per_q = (
        ivf.join(
            F.broadcast(exact.withColumn("__hit", F.lit(True))),
            ["query_id", "vec_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("cell").alias("n_cells"),
            F.count("__hit").alias("h"),
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("n").cast("long").alias("n_results"),
        ((F.min("n") == F.lit(K)) & (F.max("n") == F.lit(K))).alias("per_query_k_ok"),
        (F.max("n_cells") <= F.lit(S.N_PROBE)).alias("cell_consistent"),
        (F.sum("h") >= F.lit(6)).alias("recall_floor_ok"),
    )


def vector_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization reduced to a deterministic invariant row (same
    scheme as ann_kmeans_ivf_topk — trained codebooks aren't static SQL):

    - n_vectors: every corpus vector is encoded;
    - codes_in_range / code_len_ok: m=8 codes per vector, each in [0,16);
    - mse_ratio_ok: mean squared reconstruction error <= 0.7 x mean squared
      norm (measured 0.544 at sf0.01, seeds fixed — 29% slack; a broken
      codebook lookup or slice off-by-one pushes the ratio to ~1+)."""
    pq = S.product_quantize(_emb(spark, sf_dir))
    return pq.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        (
            (F.min(F.array_min("codes")) >= 0) & (F.max(F.array_max("codes")) < 16)
        ).alias("codes_in_range"),
        ((F.min(F.size("codes")) == 8) & (F.max(F.size("codes")) == 8)).alias(
            "code_len_ok"
        ),
        (F.avg("recon_err") <= 0.7 * F.avg("sq_norm")).alias("mse_ratio_ok"),
    )


def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ asymmetric-distance search reduced to a deterministic
    invariant row (same scheme as ann_kmeans_ivf_topk — two trained
    quantizers aren't static SQL):

    - n_queries / n_results: every query returns exactly K rows (nprobe=2
      candidate sets; the nprobe=1 form ran 4 results short at sf0.1 when
      one query's nearest cell held fewer than K members);
    - per_query_k_ok / cell_consistent: each query's matches come from at
      most n_probe=2 coarse cells (the multi-probe IVF contract);
    - recall_floor_ok: total overlap with the exact squared-L2 top-K is
      >= 6 (seeds fixed, fit-sample deterministic; a broken
      codebook/LUT/element_at off-by-one collapses overlap to
      near-random). r05 measured 10/25 at sf0.01, 28/100 at sf0.1 with
      residual encoding — statistically indistinguishable from the r04
      raw-vector form (11/25, 30/100) because the uniform-random fixture
      has no cluster structure for residuals to exploit; the floor
      deliberately stays at 6 rather than pretending a tighter number.
    - self_match_ok (r05, the REAL tightening that came with residual
      encoding): queries are drawn from the corpus, so each query's own
      stored copy must appear in its top-K — its ADC distance is just its
      residual's reconstruction error, far below the ~2·E||v||² distance
      to unrelated random vectors. Measured 25/25 (all at rank 1, both
      SFs); any encode/query-side residual mismatch, codebook corruption,
      or LUT off-by-one breaks this immediately.

    The per-row output shape is covered by tests/test_dedup_similarity.py
    against operators/similarity.ivf_pq_topk directly."""
    emb = _emb(spark, sf_dir)
    q = _queries(emb).select("query_id", "query_embedding")
    pq = S.ivf_pq_topk(emb, q, k=K, n_probe=S.N_PROBE)
    exact = knn.knn_search(emb, q, k=K, metric="euclidean").select("query_id", "vec_id")
    # r16 one-pass hit counting — same restructure as ann_kmeans_ivf_topk.
    per_q = (
        pq.join(
            F.broadcast(exact.withColumn("__hit", F.lit(True))),
            ["query_id", "vec_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("cell").alias("n_cells"),
            F.max(
                (F.col("query_id") == F.col("vec_id")).cast("int")
            ).alias("self_hit"),
            F.count("__hit").alias("h"),
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("n").cast("long").alias("n_results"),
        ((F.min("n") == F.lit(K)) & (F.max("n") == F.lit(K))).alias("per_query_k_ok"),
        (F.max("n_cells") <= F.lit(S.N_PROBE)).alias("cell_consistent"),
        (F.sum("h") >= F.lit(6)).alias("recall_floor_ok"),
        (F.min("self_hit") == F.lit(1)).alias("self_match_ok"),
    )


def ann_hnsw_partitioned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL per-partition HNSW graph search (operators/hnsw.py — the
    reference's hnswlib architecture, executor.py:49/66-70/112, rebuilt
    from the public paper as a deterministic pure-numpy kernel inside the
    partitioned scatter-gather topology), reduced to the invariant scheme
    of the other trained/approximate operators:

    - n_queries / n_results / per_query_k_ok: every query returns exactly
      K merged rows;
    - recall_floor_ok: >= 60% overlap with exact cosine KNN (measured
      100% at both sf0.01 and sf0.1 — ef_search=50 is effectively exact
      on this corpus; the floor leaves room for graph-shape drift if the
      fixture changes);
    - self_match_ok: every corpus-drawn query finds its own stored copy
      (distance 0 — a navigable graph cannot miss it at ef >= K).

    Deterministic by construction (id-hash levels, id-ordered inserts,
    id tie-breaks), which is what makes these invariants stable enough to
    oracle — hnswlib itself would give a different graph every build."""
    emb = _emb(spark, sf_dir)
    q = _queries(emb).select("query_id", "query_embedding")
    # max_bucket_rows: the r06 per-bucket build ceiling — inert at fixture
    # scale (buckets stay far below 200k) so results are unchanged, but
    # the registered query exercises the 100 TB guard path
    res = S.hnsw_partitioned_topk(emb, q, k=K, max_bucket_rows=200_000)
    exact = knn.knn_search(emb, q, k=K, metric="cosine").select("query_id", "vec_id")
    # r16 one-pass hit counting — the HNSW scatter-gather (the row's
    # dominant cost) is now evaluated once, not once per aggregate branch.
    per_q = (
        res.join(
            F.broadcast(exact.withColumn("__hit", F.lit(True))),
            ["query_id", "vec_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max((F.col("query_id") == F.col("vec_id")).cast("int")).alias("self_hit"),
            F.count("__hit").alias("h"),
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("n").cast("long").alias("n_results"),
        ((F.min("n") == F.lit(K)) & (F.max("n") == F.lit(K))).alias("per_query_k_ok"),
        (F.sum("h") >= F.lit(3) * F.count(F.lit(1))).alias("recall_floor_ok"),
        (F.min("self_hit") == F.lit(1)).alias("self_match_ok"),
    )


RADIUS = 0.65  # fixture cosine distances: min non-self ~0.547, p1 ~0.70


def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius search at cosine distance <= 0.65: each query returns itself
    (dist 0) plus its genuinely-close neighbors (~p0.5 of the pair
    distribution). No top-k window, no shuffle — pure broadcast scan."""
    emb = _emb(spark, sf_dir)
    return S.range_search(emb, _queries(emb), RADIUS, metric="cosine")


def embedding_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids in long form (label, dim, centroid, n_vectors) —
    the class-prototype aggregate that seeds IVF coarse quantizers."""
    return S.label_centroids(_emb(spark, sf_dir))


EVAL_SCALE = 1_000_000


def eval_retrieval_label_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation — the IR metrics a search/training
    pipeline reports (r06): run = exact cosine top-K per query with the
    query's own stored copy excluded, relevance = shared label, metrics =
    MRR, precision@K, and capped recall@K as MICRO-SCALED INTEGERS
    (rr = 1e6 DIV first_relevant_rank etc.), so every aggregate is exact
    integer arithmetic and the oracle matches bit-for-bit — no float
    averaging anywhere. One summary row out."""
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    q = _queries(emb)
    run = knn.knn_search(
        emb, q.select("query_id", "query_embedding"), k=K + 1, metric="cosine"
    ).filter(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("rank").asc())
    run = run.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= K)
    labeled = run.join(emb.select("vec_id", "label"), "vec_id").join(
        q.select("query_id", "query_label"), "query_id"
    )
    per_q = labeled.groupBy("query_id", "query_label").agg(
        F.min(
            F.when(F.col("label") == F.col("query_label"), F.col("r"))
        ).alias("first_rel"),
        F.sum((F.col("label") == F.col("query_label")).cast("long"))
        .cast("long")
        .alias("hits"),
    )
    label_counts = emb.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_label")
    )
    per_q = (
        per_q.join(label_counts, per_q["query_label"] == label_counts["label"])
        .select(
            "query_id",
            "first_rel",
            "hits",
            (F.col("n_label") - 1).alias("n_rel"),
        )
        .select(
            "query_id",
            F.expr(
                f"CASE WHEN first_rel IS NULL THEN CAST(0 AS BIGINT) "
                f"ELSE CAST({EVAL_SCALE} AS BIGINT) DIV first_rel END"
            ).alias("rr_micro"),
            "hits",
            F.expr(
                f"CASE WHEN n_rel <= 0 THEN CAST(0 AS BIGINT) "
                f"ELSE (CAST({EVAL_SCALE} AS BIGINT) * hits)"
                f" DIV least(n_rel, CAST({K} AS BIGINT)) END"
            ).alias("recall_micro"),
        )
    )
    agg = per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("rr_micro").cast("long").alias("__sum_rr"),
        F.sum("hits").cast("long").alias("sum_hits"),
        F.sum("recall_micro").cast("long").alias("__sum_recall"),
        F.sum((F.col("rr_micro") > 0).cast("long"))
        .cast("long")
        .alias("n_queries_with_hit"),
    )
    return agg.select(
        "n_queries",
        F.expr("__sum_rr DIV n_queries").cast("long").alias("mrr_micro"),
        "sum_hits",
        F.expr(
            f"(CAST({EVAL_SCALE} AS BIGINT) * sum_hits)"
            f" DIV (n_queries * CAST({K} AS BIGINT))"
        )
        .cast("long")
        .alias("p_at_k_micro"),
        F.expr("__sum_recall DIV n_queries")
        .cast("long")
        .alias("macro_recall_micro"),
        "n_queries_with_hit",
    )


QUERIES = {
    "ann_cosine_topk_join": ann_cosine_topk_join,
    "ann_range_search": ann_range_search,
    "embedding_centroids_by_label": embedding_centroids_by_label,
    "ann_kmeans_ivf_topk": ann_kmeans_ivf_topk,
    "ann_ivf_pq_topk": ann_ivf_pq_topk,
    "ann_ivf_label_topk": ann_ivf_label_topk,
    "ann_lsh_hyperplane_topk": ann_lsh_hyperplane_topk,
    "ann_partitioned_topk": ann_partitioned_topk,
    "ann_hnsw_partitioned_topk": ann_hnsw_partitioned_topk,
    "vector_pq_codes": vector_pq_codes,
    "eval_retrieval_label_metrics": eval_retrieval_label_metrics,
}

_DOT = "list_reduce(list_transform(list_zip({a}, {b}), x -> x[1]*x[2]), (s,y) -> s+y)"
_NORM = "sqrt(" + _DOT.format(a="{a}", b="{a}") + ")"
_COS = (
    f"1.0 - {_DOT.format(a='q.qv', b='e.v')} / "
    f"({_NORM.format(a='q.qv')} * {_NORM.format(a='e.v')})"
)

_BASE = f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e WHERE vec_id % {QUERY_MOD} = 0
)
"""


def _plane_literal(p: list[float]) -> str:
    return "[" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in p) + "]"


_BUCKET = " + ".join(
    f"(CASE WHEN {_DOT.format(a='{v}', b=_plane_literal(p))} >= 0 THEN {2**i} ELSE 0 END)"
    for i, p in enumerate(S.PLANES)
)

ORACLES = {
    "vector_pq_codes": """
SELECT count(*) AS n_vectors,
       TRUE AS codes_in_range,
       TRUE AS code_len_ok,
       TRUE AS mse_ratio_ok
FROM embeddings
""",
    "ann_range_search": _BASE
    + f"""
SELECT q.query_id, e.vec_id, {_COS} AS dist
FROM e CROSS JOIN q
WHERE {_COS} <= {RADIUS}
""",
    "embedding_centroids_by_label": """
WITH e AS (
  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT label, CAST(t.i AS INT) AS dim,
       round(avg(v[t.i]), 6) AS centroid,
       count(*) AS n_vectors
FROM e, unnest(range(1, len(v) + 1)) AS t(i)
GROUP BY label, t.i
""",
    "eval_retrieval_label_metrics": _BASE
    + f"""
, scored AS (
  SELECT q.query_id, q.qlabel, e.vec_id, e.label, {_COS} AS dist
  FROM e CROSS JOIN q
), ranked AS (
  SELECT query_id, qlabel, vec_id, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id ASC) AS rk
  FROM scored
), run AS (
  SELECT query_id, qlabel, vec_id, label,
         row_number() OVER (PARTITION BY query_id ORDER BY rk) AS r
  FROM ranked WHERE rk <= {K + 1} AND vec_id <> query_id
), topk AS (SELECT * FROM run WHERE r <= {K}),
per_q AS (
  SELECT query_id, qlabel,
         min(CASE WHEN label = qlabel THEN r END) AS first_rel,
         CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM topk GROUP BY query_id, qlabel
),
lc AS (SELECT label, CAST(count(*) AS BIGINT) AS n_label FROM e GROUP BY label),
pq AS (
  SELECT query_id,
         CASE WHEN first_rel IS NULL THEN CAST(0 AS BIGINT)
              ELSE CAST({EVAL_SCALE} AS BIGINT) // first_rel END AS rr_micro,
         hits,
         CASE WHEN (n_label - 1) <= 0 THEN CAST(0 AS BIGINT)
              ELSE (CAST({EVAL_SCALE} AS BIGINT) * hits)
                   // least(n_label - 1, CAST({K} AS BIGINT)) END AS recall_micro
  FROM per_q JOIN lc ON per_q.qlabel = lc.label
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_queries,
         CAST(sum(rr_micro) AS BIGINT) AS sum_rr,
         CAST(sum(hits) AS BIGINT) AS sum_hits,
         CAST(sum(recall_micro) AS BIGINT) AS sum_recall,
         CAST(sum(CASE WHEN rr_micro > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_queries_with_hit
  FROM pq
)
SELECT n_queries,
       CAST(sum_rr // n_queries AS BIGINT) AS mrr_micro,
       sum_hits,
       CAST((CAST({EVAL_SCALE} AS BIGINT) * sum_hits)
            // (n_queries * {K}) AS BIGINT) AS p_at_k_micro,
       CAST(sum_recall // n_queries AS BIGINT) AS macro_recall_micro,
       n_queries_with_hit
FROM agg
""",
    "ann_cosine_topk_join": _BASE
    + f"""
, scored AS (
  SELECT q.query_id, e.vec_id, {_COS} AS dist FROM e CROSS JOIN q
), ranked AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS "rank"
  FROM scored
)
SELECT query_id, vec_id, "rank", dist AS score FROM ranked WHERE "rank" <= {K}
""",
    "ann_ivf_label_topk": _BASE
    + f"""
, scored AS (
  SELECT q.query_id, e.vec_id, {_COS} AS dist
  FROM e JOIN q ON e.label = q.qlabel
), ranked AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS "rank"
  FROM scored
)
SELECT query_id, vec_id, "rank", dist FROM ranked WHERE "rank" <= {K}
""",
    "ann_lsh_hyperplane_topk": _BASE
    + f"""
, eb AS (
  SELECT vec_id, v, {_BUCKET.format(v='v')} AS bucket FROM e
), qb AS (
  SELECT query_id, qv, {_BUCKET.format(v='qv')} AS bucket FROM q
), scored AS (
  SELECT qb.query_id, eb.vec_id,
         1.0 - {_DOT.format(a='qb.qv', b='eb.v')} /
              ({_NORM.format(a='qb.qv')} * {_NORM.format(a='eb.v')}) AS dist
  FROM eb JOIN qb ON eb.bucket = qb.bucket
), ranked AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS "rank"
  FROM scored
)
SELECT query_id, vec_id, "rank", dist FROM ranked WHERE "rank" <= {K}
""",
    "ann_partitioned_topk": _BASE
    + f"""
, scored AS (
  SELECT q.query_id, e.vec_id, {_COS} AS dist FROM e CROSS JOIN q
), ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS "rank"
  FROM scored
)
SELECT query_id, vec_id, "rank" FROM ranked WHERE "rank" <= {K}
""",
    # The trained centroids aren't expressible in static SQL; the oracle
    # states the EXPECTED invariants (each of the corpus-derived queries
    # yields exactly K one-cell rows with >= 6/25 exact-KNN overlap) and the
    # Spark side computes the ACTUAL ones — any IVF regression flips a
    # boolean or a count and hash-mismatches.
    "ann_kmeans_ivf_topk": f"""
SELECT count(*) AS n_queries,
       CAST(count(*) * {K} AS BIGINT) AS n_results,
       true AS per_query_k_ok,
       true AS cell_consistent,
       true AS recall_floor_ok
FROM embeddings WHERE vec_id % {QUERY_MOD} = 0
""",
    # same invariant scheme: the oracle states the EXPECTED facts about an
    # IVF-PQ result (K one-cell rows per query, >= 6/25 exact-KNN overlap,
    # every query finds its own stored copy); the Spark side computes the
    # ACTUAL ones — any quantizer/LUT/encode regression flips a boolean or
    # a count and hash-mismatches.
    "ann_ivf_pq_topk": f"""
SELECT count(*) AS n_queries,
       CAST(count(*) * {K} AS BIGINT) AS n_results,
       true AS per_query_k_ok,
       true AS cell_consistent,
       true AS recall_floor_ok,
       true AS self_match_ok
FROM embeddings WHERE vec_id % {QUERY_MOD} = 0
""",
    # HNSW is approximate + graph-shaped, not SQL-expressible: the oracle
    # states the EXPECTED invariants (K merged rows per query, >=60%
    # exact-KNN overlap, every query finds its own copy); the Spark side
    # computes the ACTUAL ones over the deterministic graph.
    "ann_hnsw_partitioned_topk": f"""
SELECT count(*) AS n_queries,
       CAST(count(*) * {K} AS BIGINT) AS n_results,
       true AS per_query_k_ok,
       true AS recall_floor_ok,
       true AS self_match_ok
FROM embeddings WHERE vec_id % {QUERY_MOD} = 0
""",
}


MMR_M, MMR_N = 8, 4


def ann_mmr_rerank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank (r12, operators/similarity.mmr_rerank):
    every (vec_id % QUERY_MOD == 0) query's top-8 cosine candidates
    greedily reduced to 4 diverse picks at lambda=0.5 — the Carbonell &
    Goldstein SIGIR'98 re-rank as n unrolled pure-Catalyst steps (anti-
    join + penalty join + per-query window argmax per step). The oracle
    replays the identical unrolled greedy over the identical fold-order
    similarities, so a wrong penalty, tie rule, or step order diverges."""
    emb = tables.load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    return S.mmr_rerank(emb, q, m=MMR_M, n=MMR_N, lam=0.5)


def _mmr_oracle(m: int, n: int) -> str:
    cos_qe = (
        f"1.0 - {_DOT.format(a='q.qv', b='e.v')} / "
        f"({_NORM.format(a='q.qv')} * {_NORM.format(a='e.v')})"
    )
    # sim between two candidates, kept literally as 1.0 - (1.0 - dot/nn):
    # the Spark side computes 1.0 - cosine_distance and double arithmetic
    # does NOT simplify 1.0-(1.0-x) to x
    sim_ab = (
        f"1.0 - (1.0 - {_DOT.format(a='ca.v', b='cb.v')} / "
        f"({_NORM.format(a='ca.v')} * {_NORM.format(a='cb.v')}))"
    )
    parts = [
        _BASE.rstrip(),
        f""", cand0 AS (
  SELECT q.query_id, e.vec_id, {cos_qe} AS dist, e.v
  FROM e CROSS JOIN q
), cand AS (
  SELECT query_id, vec_id, 1.0 - dist AS rel, v
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY dist ASC, vec_id ASC
    ) AS rn FROM cand0
  ) WHERE rn <= {m}
), sims AS (
  SELECT ca.query_id, ca.vec_id AS a, cb.vec_id AS b, {sim_ab} AS sim
  FROM cand ca JOIN cand cb
    ON ca.query_id = cb.query_id AND ca.vec_id <> cb.vec_id
), s1 AS (
  SELECT query_id, 1 AS step, vec_id, rel FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY rel DESC, vec_id ASC
    ) AS rn2 FROM cand
  ) WHERE rn2 = 1
), sel1 AS (SELECT * FROM s1)""",
    ]
    for i in range(2, n + 1):
        parts.append(f""", p{i} AS (
  SELECT s.query_id, s.a AS vec_id, max(s.sim) AS pen
  FROM sims s JOIN sel{i - 1} t ON s.query_id = t.query_id AND s.b = t.vec_id
  GROUP BY 1, 2
), r{i} AS (
  SELECT c.query_id, c.vec_id, c.rel,
         0.5e0 * c.rel - 0.5e0 * p.pen AS mmr
  FROM cand c JOIN p{i} p USING (query_id, vec_id)
  WHERE NOT EXISTS (
    SELECT 1 FROM sel{i - 1} t
    WHERE t.query_id = c.query_id AND t.vec_id = c.vec_id
  )
), s{i} AS (
  SELECT query_id, {i} AS step, vec_id, rel FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY mmr DESC, vec_id ASC
    ) AS rn2 FROM r{i}
  ) WHERE rn2 = 1
), sel{i} AS (SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM s{i})""")
    parts.append(
        f"\nSELECT query_id, CAST(step AS INT) AS step, vec_id, rel\n"
        f"FROM sel{n} ORDER BY query_id, step\n"
    )
    return "".join(parts)


QUERIES["ann_mmr_rerank_topn"] = ann_mmr_rerank_topn
ORACLES["ann_mmr_rerank_topn"] = _mmr_oracle(MMR_M, MMR_N)


def eval_ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of the ANN lanes vs exact cosine KNN, MEASURED as an
    exact integer (r13, VERDICT r12 #6b — the ef/M recall trade-off the
    reference tunes by hand, executor.py:22-24, measured rather than
    asserted). One row per method: (method, n_queries, n_results,
    n_hits, recall_at_k_micro) with recall = 1e6 * |ANN∩exact| floor-div
    (n_queries * K) — pure integer arithmetic, no float in the metric.

    Lanes: `exact_control` (the trivially-perfect baseline, which also
    pins n_queries*K result rows), `ivf_label` and `lsh_hyperplane`
    (candidate generation fully SQL-expressible, so the oracle replays
    the ENTIRE retrieval and the measured recall is exact cross-engine
    — the set intersections are deterministic because every lane
    breaks ties (dist, vec_id) identically, pinned by each lane's own
    registry row), and `hnsw_partitioned` (graph search not
    SQL-expressible; its recall is 100% at every fixture SF — ef=50 >>
    K=5 on this corpus — so the oracle states n_queries*K hits as the
    EXPECTED exact fact, the invariant-oracle scheme of the ann_hnsw
    row but pinned to the measured value instead of a >=60% floor: ANY
    missed neighbor at ANY SF now hash-mismatches)."""
    emb = _emb(spark, sf_dir)
    q = _queries(emb)
    q2 = q.select("query_id", "query_embedding")
    # MEASURED NON-CHANGE (r16 optimization round): each lane's result
    # set is consumed twice and the exact run feeds every lane's hit
    # semi-join, so the plan textually repeats each retrieval subtree
    # (26 BNLJ occurrences before). cache.pin()ing the bounded result
    # sets was tried and REVERTED: the duplicated branches materialize
    # as CONCURRENT query stages that hide on idle cores, while the
    # lazy cache adds write/lock overhead on the hot path — interleaved
    # same-session A/B at sf0.1 read median 3.44 s unpinned vs 4.35 s
    # pinned. The broadcast hint on the exact side below IS kept: the
    # semi-joins' build side is n_queries x K rows (bounded metadata at
    # any corpus scale), and the hint replaces SMJ+exchange pairs with
    # broadcast-hash semi joins (guide §3.1).
    # r17 (VERDICT r16 #2): evaluate the shared bounded frames ONCE via
    # eager localCheckpoint — the package's standard bounded-state
    # pattern (graph._adjacency), NOT the lazy cache.pin the r16 A/B
    # rejected. Two frames qualify:
    # - q (n_queries rows): every lane re-derived it from its own
    #   embeddings scan — 5 corpus scans to rebuild the same tiny frame;
    # - exact (n_queries x K rows): consumed by the exact_control lane
    #   AND the four broadcast hit-flag builds. The broadcast builds were
    #   already deduped at runtime by exchange reuse, but the
    #   exact_control consumption was a genuine second evaluation of the
    #   corpus-sized BNLJ subtree.
    # Interleaved A/B at sf0.1 (tools/ab_measure.py, wall + JVM-CPU per
    # repeat): JVM CPU −11..−21% across three windows; wall neutral on a
    # quiet host (duplicates hide on idle cores) and BETTER under real
    # contention (median 15.6 s vs 17.6 s on a loaded window) — the
    # busy-cluster case is what 100 TB looks like. Oracle green 3 SFs.
    q = q.localCheckpoint(eager=True)
    q2 = q.select("query_id", "query_embedding")
    exact = knn.knn_search(emb, q2, k=K, metric="cosine").select(
        "query_id", "vec_id"
    ).localCheckpoint(eager=True)
    lanes = {
        "exact_control": exact,
        "hnsw_partitioned": S.hnsw_partitioned_topk(
            emb, q2, k=K, max_bucket_rows=200_000
        ).select("query_id", "vec_id"),
        "ivf_label": S.bucketed_topk(
            emb,
            q,
            bucket_stored=F.col("label"),
            bucket_query=F.col("query_label"),
            k=K,
            metric="cosine",
        ).select("query_id", "vec_id"),
        "lsh_hyperplane": S.bucketed_topk(
            emb,
            q,
            bucket_stored=S.sign_lsh_bucket(F.col("embedding").cast("array<double>")),
            bucket_query=S.sign_lsh_bucket(
                F.col("query_embedding").cast("array<double>")
            ),
            k=K,
            metric="cosine",
        ).select("query_id", "vec_id"),
    }
    # r16: n_results and n_hits from ONE pass over each lane's result set
    # — a broadcast LEFT join against the hit-flagged exact set, counting
    # rows and non-null flags in a single aggregate. The old
    # count-agg + semi-join-agg pair evaluated every retrieval subtree
    # twice (the pinned-cache alternative lost the A/B above; this form
    # simply halves the work with no cache). exact is unique per
    # (query_id, vec_id), so the left join emits each result row once.
    hitflag = exact.withColumn("__hit", F.lit(True))
    per_lane = None
    for name, res in lanes.items():
        row = (
            res.join(F.broadcast(hitflag), ["query_id", "vec_id"], "left")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_results"),
                F.count("__hit").cast("long").alias("n_hits"),
            )
            .select(F.lit(name).alias("method"), "n_results", "n_hits")
        )
        per_lane = row if per_lane is None else per_lane.unionByName(row)
    nq = q.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    return (
        per_lane.crossJoin(F.broadcast(nq))
        .select(
            "method",
            "n_queries",
            "n_results",
            "n_hits",
            F.expr(
                f"CAST({EVAL_SCALE} * n_hits"
                f" DIV nullif(n_queries * {K}, 0) AS BIGINT)"
            ).alias("recall_at_k_micro"),
        )
        .orderBy("method")
    )


_LSH_COS = (
    f"1.0 - {_DOT.format(a='qb.qv', b='eb.v')} / "
    f"({_NORM.format(a='qb.qv')} * {_NORM.format(a='eb.v')})"
)

_RECALL_SQL = (
    _BASE
    + f"""
, scored AS (
  SELECT q.query_id, e.vec_id, {_COS} AS dist FROM e CROSS JOIN q
), exact AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dist ASC, vec_id ASC) AS rk
    FROM scored) t WHERE rk <= {K}
), ivf AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_COS} ASC, e.vec_id ASC) AS rk
    FROM e JOIN q ON e.label = q.qlabel) t WHERE rk <= {K}
), eb AS (
  SELECT vec_id, v, {_BUCKET.format(v='v')} AS bucket FROM e
), qb AS (
  SELECT query_id, qv, {_BUCKET.format(v='qv')} AS bucket FROM q
), lsh AS (
  SELECT query_id, vec_id FROM (
    SELECT qb.query_id, eb.vec_id,
           row_number() OVER (PARTITION BY qb.query_id
                              ORDER BY {_LSH_COS} ASC, eb.vec_id ASC) AS rk
    FROM eb JOIN qb ON eb.bucket = qb.bucket) t WHERE rk <= {K}
), nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q),
lanes AS (
  SELECT 'exact_control' AS method,
         (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_results,
         (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_hits
  UNION ALL
  -- DELIBERATE PIN, not a replay (ADVICE r13 / see the builder
  -- docstring above): the HNSW lane's recall is pinned at its
  -- measured 100% (n_queries*K results, all hits). A fixture or
  -- ef/M change that lowers HNSW recall surfaces as a hash
  -- mismatch on this row — update the pin only after re-measuring.
  SELECT 'hnsw_partitioned',
         (SELECT CAST(n_queries * {K} AS BIGINT) FROM nq),
         (SELECT CAST(n_queries * {K} AS BIGINT) FROM nq)
  UNION ALL
  SELECT 'ivf_label',
         (SELECT CAST(count(*) AS BIGINT) FROM ivf),
         (SELECT CAST(count(*) AS BIGINT) FROM
            (SELECT * FROM ivf INTERSECT SELECT * FROM exact) x)
  UNION ALL
  SELECT 'lsh_hyperplane',
         (SELECT CAST(count(*) AS BIGINT) FROM lsh),
         (SELECT CAST(count(*) AS BIGINT) FROM
            (SELECT * FROM lsh INTERSECT SELECT * FROM exact) x)
)
SELECT method, n_queries, n_results, n_hits,
       CAST(({EVAL_SCALE} * n_hits) // nullif(n_queries * {K}, 0) AS BIGINT)
         AS recall_at_k_micro
FROM lanes, nq ORDER BY method
"""
)

QUERIES["eval_ann_recall_at_k"] = eval_ann_recall_at_k
ORACLES["eval_ann_recall_at_k"] = _RECALL_SQL


def eval_ann_recall_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group recall@K (r14, VERDICT r13 #5b): the slice-level form
    of eval_ann_recall_at_k — recall by query LABEL, the per-segment
    retrieval audit a real eval wants (an ANN lane can read 95% overall
    while one slice sits at 60%; only the grouped view shows it). One
    row per (method, label): n_queries, n_results, n_hits and the exact
    integer recall_at_k_micro with the label's own n_queries*K
    denominator.

    Lanes: ivf_label and lsh_hyperplane — the two lanes whose recall
    genuinely VARIES by slice and whose retrieval the oracle replays in
    full (both per-lane registry rows pin the tie-break determinism the
    set intersections rely on). exact_control is omitted (per-group
    recall is 1.0 by definition — no measurement) and hnsw_partitioned
    is omitted because its oracle would be the deliberate per-group PIN
    the ungrouped row already carries once (see the DELIBERATE PIN note
    there) while re-running the row's dominant cost, the C-kernel graph
    build. Scale shape: the same one-exact-KNN + semi-joins-over-
    result-sets economy as the ungrouped row, cheaper by the HNSW
    build."""
    emb = _emb(spark, sf_dir)
    q = _queries(emb)
    q2 = q.select("query_id", "query_embedding")
    # r17 (VERDICT r16 #2): q evaluated ONCE via eager localCheckpoint —
    # each consumer (both lanes' query sides, qlab, exact's build, nq)
    # re-derived it from its own embeddings scan. Interleaved A/B at
    # sf0.1: JVM CPU −16% (4.38 → 3.69 median), wall neutral
    # (2.44 → 2.40). exact is deliberately NOT checkpointed here: both
    # its consumers are broadcast hit-flag builds that runtime exchange
    # reuse already dedupes, so a checkpoint added a serial barrier for
    # no CPU win (measured: wall +0.4 s, CPU flat).
    q = q.localCheckpoint(eager=True)
    q2 = q.select("query_id", "query_embedding")
    qlab = q.select("query_id", F.col("query_label").alias("label"))
    # Pins tried and reverted here exactly as in eval_ann_recall_at_k
    # (interleaved A/B: median 2.47 s unpinned vs 2.83 s pinned at
    # sf0.1); the broadcast hint on the exact semi-join side is kept.
    exact = knn.knn_search(emb, q2, k=K, metric="cosine").select(
        "query_id", "vec_id"
    )
    lanes = {
        "ivf_label": S.bucketed_topk(
            emb,
            q,
            bucket_stored=F.col("label"),
            bucket_query=F.col("query_label"),
            k=K,
            metric="cosine",
        ).select("query_id", "vec_id"),
        "lsh_hyperplane": S.bucketed_topk(
            emb,
            q,
            bucket_stored=S.sign_lsh_bucket(F.col("embedding").cast("array<double>")),
            bucket_query=S.sign_lsh_bucket(
                F.col("query_embedding").cast("array<double>")
            ),
            k=K,
            metric="cosine",
        ).select("query_id", "vec_id"),
    }
    nq = q.groupBy(F.col("query_label").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_queries")
    )
    # r16: one pass per lane — broadcast LEFT join against the
    # hit-flagged exact set, then a single per-label aggregate counting
    # rows (n_results) and non-null flags (n_hits). This keeps the
    # ADVICE r14 zero-hit-slice contract by construction: a slice whose
    # retrieved rows contain no exact hit still has its result rows in
    # the group, so it surfaces with n_hits = 0 instead of dropping —
    # while evaluating each retrieval subtree ONCE instead of twice
    # (the res_l/hits_l pair; the pinned-cache alternative lost the
    # interleaved A/B recorded above).
    hitflag = exact.withColumn("__hit", F.lit(True))
    per_lane = None
    for name, res in lanes.items():
        row = (
            res.join(F.broadcast(hitflag), ["query_id", "vec_id"], "left")
            .join(F.broadcast(qlab), "query_id")
            .groupBy("label")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_results"),
                F.count("__hit").cast("long").alias("n_hits"),
            )
            .select(F.lit(name).alias("method"), "label", "n_results", "n_hits")
        )
        per_lane = row if per_lane is None else per_lane.unionByName(row)
    return (
        per_lane.join(F.broadcast(nq), "label")
        .select(
            "method",
            "label",
            "n_queries",
            "n_results",
            "n_hits",
            F.expr(
                f"CAST({EVAL_SCALE} * n_hits"
                f" DIV nullif(n_queries * {K}, 0) AS BIGINT)"
            ).alias("recall_at_k_micro"),
        )
        .orderBy("method", "label")
    )


_RECALL_GROUP_SQL = (
    _BASE
    + f"""
, scored AS (
  SELECT q.query_id, e.vec_id, {_COS} AS dist FROM e CROSS JOIN q
), exact AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dist ASC, vec_id ASC) AS rk
    FROM scored) t WHERE rk <= {K}
), ivf AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_COS} ASC, e.vec_id ASC) AS rk
    FROM e JOIN q ON e.label = q.qlabel) t WHERE rk <= {K}
), eb AS (
  SELECT vec_id, v, {_BUCKET.format(v='v')} AS bucket FROM e
), qb AS (
  SELECT query_id, qv, {_BUCKET.format(v='qv')} AS bucket FROM q
), lsh AS (
  SELECT query_id, vec_id FROM (
    SELECT qb.query_id, eb.vec_id,
           row_number() OVER (PARTITION BY qb.query_id
                              ORDER BY {_LSH_COS} ASC, eb.vec_id ASC) AS rk
    FROM eb JOIN qb ON eb.bucket = qb.bucket) t WHERE rk <= {K}
), nq AS (
  SELECT qlabel AS label, CAST(count(*) AS BIGINT) AS n_queries
  FROM q GROUP BY qlabel
), ivf_g AS (
  SELECT q.qlabel AS label, CAST(count(*) AS BIGINT) AS n_results,
         CAST(count(*) FILTER (WHERE ex.vec_id IS NOT NULL) AS BIGINT) AS n_hits
  FROM ivf i JOIN q ON q.query_id = i.query_id
  LEFT JOIN exact ex ON ex.query_id = i.query_id AND ex.vec_id = i.vec_id
  GROUP BY q.qlabel
), lsh_g AS (
  SELECT q.qlabel AS label, CAST(count(*) AS BIGINT) AS n_results,
         CAST(count(*) FILTER (WHERE ex.vec_id IS NOT NULL) AS BIGINT) AS n_hits
  FROM lsh s JOIN q ON q.query_id = s.query_id
  LEFT JOIN exact ex ON ex.query_id = s.query_id AND ex.vec_id = s.vec_id
  GROUP BY q.qlabel
), lanes AS (
  SELECT 'ivf_label' AS method, * FROM ivf_g
  UNION ALL
  SELECT 'lsh_hyperplane' AS method, * FROM lsh_g
)
SELECT l.method, l.label, n.n_queries, l.n_results, l.n_hits,
       CAST({EVAL_SCALE} * l.n_hits
            // nullif(n.n_queries * {K}, 0) AS BIGINT) AS recall_at_k_micro
FROM lanes l JOIN nq n ON n.label = l.label
ORDER BY l.method, l.label
"""
)

QUERIES["eval_ann_recall_by_group"] = eval_ann_recall_by_group
ORACLES["eval_ann_recall_by_group"] = _RECALL_GROUP_SQL


# nDCG@K discount literals, computed ONCE here and inlined into BOTH
# engine sides: d_r = round(1e6 / log2(r+1)). K=5, so the classic
# transcendental discount table is five integers and the whole metric
# runs in exact BIGINT arithmetic at query time — the PMI/bigram-LM
# single-rounding treatment taken to its limit (zero runtime
# transcendentals; a libm ulp cannot exist where no log is evaluated).
import math as _math

_NDCG_D = tuple(round(1_000_000 / _math.log2(r + 1)) for r in range(1, K + 1))
_NDCG_P = tuple(sum(_NDCG_D[:i]) for i in range(K + 1))  # prefix sums, P[0]=0
_NDCG_GAIN = (
    "CASE r "
    + " ".join(f"WHEN {r + 1} THEN {d}" for r, d in enumerate(_NDCG_D))
    + " END"
)
_NDCG_IDCG = (
    "CASE n_ideal "
    + " ".join(f"WHEN {i} THEN {p}" for i, p in enumerate(_NDCG_P))
    + " END"
)


def eval_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@K over the label-relevance run (r14) — the graded-ranking
    member completing the IR metric set (MRR, precision@K, recall@K,
    and now normalized discounted cumulative gain): same exact-cosine
    top-K run as eval_retrieval_label_metrics (self excluded, binary
    label relevance), DCG = sum of the literal integer discounts at the
    relevant ranks, IDCG = the literal prefix sum at least(n_rel, K),
    per-query ndcg = 1e6*DCG DIV IDCG — every aggregate exact BIGINT,
    the discount table shared as module literals with the oracle (see
    _NDCG_D). One summary row: n_queries, n_queries_with_rel,
    sum_dcg_micro, mean_ndcg_micro (floor-mean of per-query micros)."""
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    q = _queries(emb)
    # r17 measured NON-change (VERDICT r16 #2): checkpointing q here was
    # A/B-rejected — q has only two consumers (run's build + the label
    # join), so the saved scan did not pay for the added barrier
    # (interleaved 8-rep A/B: wall 1.10 -> 1.18, CPU 2.49 -> 2.33). The
    # BNLJ run is consumed once; nothing else repeats. Closed.
    run = knn.knn_search(
        emb, q.select("query_id", "query_embedding"), k=K + 1, metric="cosine"
    ).filter(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("rank").asc())
    run = run.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= K)
    labeled = run.join(emb.select("vec_id", "label"), "vec_id").join(
        q.select("query_id", F.col("query_label").alias("qlabel")), "query_id"
    )
    per_q = labeled.groupBy("query_id", "qlabel").agg(
        F.sum(
            F.when(F.col("label") == F.col("qlabel"), F.expr(_NDCG_GAIN)).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("dcg_micro")
    )
    label_counts = emb.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_label")
    )
    pq = (
        per_q.join(label_counts, per_q["qlabel"] == label_counts["label"])
        .select(
            "query_id",
            "dcg_micro",
            F.expr(f"least(n_label - 1, CAST({K} AS BIGINT))").alias("n_ideal"),
        )
        .select(
            "query_id",
            "dcg_micro",
            F.expr(
                f"CASE WHEN n_ideal <= 0 THEN CAST(0 AS BIGINT)"
                f" ELSE (CAST({EVAL_SCALE} AS BIGINT) * dcg_micro)"
                f" DIV ({_NDCG_IDCG}) END"
            ).alias("ndcg_micro"),
        )
    )
    return pq.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum((F.col("dcg_micro") > 0).cast("long"))
        .cast("long")
        .alias("n_queries_with_rel"),
        F.sum("dcg_micro").cast("long").alias("sum_dcg_micro"),
        F.expr("CAST(sum(ndcg_micro) DIV count(*) AS BIGINT)").alias(
            "mean_ndcg_micro"
        ),
    )


_NDCG_SQL = (
    _BASE
    + f"""
, scored AS (
  SELECT q.query_id, q.qlabel, e.vec_id, e.label, {_COS} AS dist
  FROM e CROSS JOIN q
), ranked AS (
  SELECT query_id, qlabel, vec_id, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id ASC) AS rk
  FROM scored
), run AS (
  SELECT query_id, qlabel, vec_id, label,
         row_number() OVER (PARTITION BY query_id ORDER BY rk) AS r
  FROM ranked WHERE rk <= {K + 1} AND vec_id <> query_id
), topk AS (SELECT * FROM run WHERE r <= {K}),
per_q AS (
  SELECT query_id, qlabel,
         CAST(sum(CASE WHEN label = qlabel THEN {_NDCG_GAIN} ELSE 0 END)
              AS BIGINT) AS dcg_micro
  FROM topk GROUP BY query_id, qlabel
),
lc AS (SELECT label, CAST(count(*) AS BIGINT) AS n_label FROM e GROUP BY label),
pq AS (
  SELECT query_id, dcg_micro, n_ideal,
         CASE WHEN n_ideal <= 0 THEN CAST(0 AS BIGINT)
              ELSE (CAST({EVAL_SCALE} AS BIGINT) * dcg_micro)
                   // ({_NDCG_IDCG}) END AS ndcg_micro
  FROM (SELECT query_id, dcg_micro,
               least(n_label - 1, CAST({K} AS BIGINT)) AS n_ideal
        FROM per_q JOIN lc ON per_q.qlabel = lc.label) t
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(CASE WHEN dcg_micro > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_queries_with_rel,
       CAST(sum(dcg_micro) AS BIGINT) AS sum_dcg_micro,
       CAST(sum(ndcg_micro) // count(*) AS BIGINT) AS mean_ndcg_micro
FROM pq
"""
)

QUERIES["eval_retrieval_ndcg"] = eval_retrieval_ndcg
ORACLES["eval_retrieval_ndcg"] = _NDCG_SQL


# --- r17 growth candidate (VERDICT r15 #3b), deliberately UNREGISTERED:
# the r16 cadence cap (<=2 rows) was spent on the grouped MWU + grouped
# PSI registrations. Register as `eval_ann_recall_vs_ef` in r17 with
# 3-SF oracle checks at registration (the mann_whitney_u_by_group
# precedent). The pytest pin lives in tests/test_similarity.py.

EF_CURVE = (5, 8, 16, 50)


def eval_ann_recall_vs_ef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of the HNSW lane as a MEASURED CURVE over ef_search
    (r16, VERDICT r15 #3b): the reference's accuracy/speed knob (§2.A
    #19, executor.py:22-24 — ef trades recall for query time) measured
    at four ef values in one row set instead of asserted at a single
    point. One output row per ef: (ef_search, n_queries, n_results,
    n_hits, recall_at_k_micro), the eval_ann_recall_at_k contract with
    the method axis replaced by the knob axis. The from-scratch HNSW
    (operators/hnsw.py) is deterministic — id-hash levels, id-ordered
    inserts, id tie-breaks — so the curve is a stable measured fact of
    (fixture, ef), not a flaky sample: at the 500-vector fixtures
    recall is 24/25 at ef=5 and perfect from ef=8; at the 2000-vector
    fixture it climbs 88 -> 96 -> 100 hits across ef=5/8/16 (graph
    search must widen its beam as the corpus grows — the exact
    trade-off the reference documents for the knob).

    Oracle scheme: graph search is not SQL-expressible, so the DuckDB
    twin extends eval_ann_recall_at_k's judge-adjudicated measured-pin
    scheme to the curve — per-fixture pins keyed on the corpus row
    count, with NO fallback row: an unmeasured fixture yields zero
    oracle rows and a loud mismatch, and ANY recall change at ANY
    pinned fixture hash-mismatches. Re-measure before moving a pin."""
    emb = _emb(spark, sf_dir)
    q2 = _queries(emb).select("query_id", "query_embedding")
    exact = knn.knn_search(emb, q2, k=K, metric="cosine").select(
        "query_id", "vec_id"
    )
    per_ef = None
    for ef in EF_CURVE:
        res = S.hnsw_partitioned_topk(
            emb, q2, k=K, ef_search=ef, max_bucket_rows=200_000
        ).select("query_id", "vec_id")
        row = (
            res.agg(F.count(F.lit(1)).cast("long").alias("n_results"))
            .crossJoin(
                res.join(exact, ["query_id", "vec_id"], "leftsemi").agg(
                    F.count(F.lit(1)).cast("long").alias("n_hits")
                )
            )
            .select(F.lit(ef).alias("ef_search"), "n_results", "n_hits")
        )
        per_ef = row if per_ef is None else per_ef.unionByName(row)
    nq = q2.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    return (
        per_ef.crossJoin(F.broadcast(nq))
        .select(
            "ef_search",
            "n_queries",
            "n_results",
            "n_hits",
            F.expr(
                f"CAST({EVAL_SCALE} * n_hits"
                f" DIV nullif(n_queries * {K}, 0) AS BIGINT)"
            ).alias("recall_at_k_micro"),
        )
        .orderBy("ef_search")
    )


_RECALL_VS_EF_PINS = (
    # (corpus_rows, ef_search, n_hits) — measured on the deterministic
    # from-scratch HNSW; see the eval_ann_recall_vs_ef docstring.
    (500, 5, 24),
    (500, 8, 25),
    (500, 16, 25),
    (500, 50, 25),
    (2000, 5, 88),
    (2000, 8, 96),
    (2000, 16, 100),
    (2000, 50, 100),
)

_RECALL_VS_EF_SQL = (
    _BASE
    + f"""
, nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q),
ne AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM e),
pins(n_corpus, ef_search, pinned_hits) AS (VALUES
  {", ".join(f"({c}, {ef}, {h})" for c, ef, h in _RECALL_VS_EF_PINS)}),
rows_ AS (
  SELECT CAST(ef_search AS INTEGER) AS ef_search,
         n_queries,
         CAST(n_queries * {K} AS BIGINT) AS n_results,
         CAST(pinned_hits AS BIGINT) AS n_hits
  FROM pins JOIN ne ON pins.n_corpus = ne.n_corpus CROSS JOIN nq
)
SELECT ef_search, n_queries, n_results, n_hits,
       CAST(({EVAL_SCALE} * n_hits) // nullif(n_queries * {K}, 0) AS BIGINT)
         AS recall_at_k_micro
FROM rows_ ORDER BY ef_search
"""
)


# --- further prebuilt growth candidate (r17/r18 pool), deliberately
# UNREGISTERED like the two named in suites/__init__.py — the IVF
# sibling of eval_ann_recall_vs_ef, with the stronger oracle (full
# DuckDB replay, no pins): registration order per the next VERDICT.

NPROBE_CURVE = (1, 2, 4, 8)


def eval_ann_recall_vs_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of the IVF lane as a MEASURED CURVE over nprobe (r16):
    the coarse-quantizer probe width — IVF's accuracy/speed knob, the
    exact analog of HNSW's ef_search (§2.A #19) — measured at four
    widths in one row set. Cells are the fixture labels seeded by
    their centroids (S.label_centroids, round(avg,6) boundary); each
    query ranks cells by centroid cosine distance with the (dist,
    label) tie-break, probes its nprobe nearest cells, and takes the
    top-K by (dist, vec_id) from the probed union. One row per
    nprobe: (nprobe, n_queries, n_results, n_hits, recall_at_k_micro).

    Recall is provably non-decreasing in nprobe (a wider probe can
    displace a true hit only with a globally-closer vector, which is
    itself a true hit — pinned in pytest), and the ivf_label lane of
    eval_ann_recall_at_k is the semantic cousin of nprobe=1 (it
    probes the query's OWN label rather than the centroid-nearest).

    Unlike the ef curve, the whole retrieval is SQL-expressible, so
    the DuckDB twin replays centroids, cell ranking, probing, and
    top-K end-to-end — measured recall is exact cross-engine with NO
    pin table. Scale shape: centroids are one (label, dim) shuffle;
    the probed-cells frame is queries x max(nprobe) rows (broadcast);
    the corpus joins it per cell and never re-shuffles; the single
    top-K window partitions by (nprobe, query) — the probes axis
    rides the same window, not four separate passes."""
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    q2 = _queries(emb).select(
        "query_id",
        V.as_double_array("query_embedding").alias("__qvec"),
    ).withColumn("__qn", V.norm(F.col("__qvec")))
    exact = knn.knn_search(
        emb, _queries(emb).select("query_id", "query_embedding"), k=K, metric="cosine"
    ).select("query_id", "vec_id")
    cent = (
        S.label_centroids(emb)
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "centroid"))),
                lambda s: s["centroid"],
            ).alias("__cvec")
        )
        .withColumn("__cn", V.norm(F.col("__cvec")))
    )
    max_p = max(NPROBE_CURVE)
    cell_w = Window.partitionBy("query_id").orderBy(
        F.col("__cdist").asc(), F.col("label").asc()
    )
    probed = (
        q2.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "__qvec",
            "__qn",
            "label",
            (
                F.lit(1.0)
                - V.dot(F.col("__qvec"), F.col("__cvec"))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("__cdist"),
        )
        .withColumn("cell_rank", F.row_number().over(cell_w))
        .filter(F.col("cell_rank") <= max_p)
        .select("query_id", "__qvec", "__qn", "label", "cell_rank")
    )
    stored = emb.select(
        "vec_id", "label", V.as_double_array("embedding").alias("__svec")
    ).withColumn("__sn", V.norm(F.col("__svec")))
    probes = F.explode(
        F.array(*[F.lit(p) for p in NPROBE_CURVE])
    ).alias("nprobe")
    topk_w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.col("__dist").asc(), F.col("vec_id").asc()
    )
    topk = (
        stored.join(F.broadcast(probed), "label")
        .select(
            "query_id",
            "vec_id",
            "cell_rank",
            (
                F.lit(1.0)
                - V.dot(F.col("__qvec"), F.col("__svec"))
                / (F.col("__qn") * F.col("__sn"))
            ).alias("__dist"),
        )
        .select("query_id", "vec_id", "cell_rank", "__dist", probes)
        .filter(F.col("cell_rank") <= F.col("nprobe"))
        .withColumn("__rn", F.row_number().over(topk_w))
        .filter(F.col("__rn") <= K)
    )
    per_p = (
        topk.groupBy("nprobe")
        .agg(F.count(F.lit(1)).cast("long").alias("n_results"))
        .join(
            topk.join(exact, ["query_id", "vec_id"], "leftsemi")
            .groupBy("nprobe")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits")),
            "nprobe",
            "left",
        )
        .fillna(0, subset=["n_hits"])
    )
    nq = q2.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    return (
        per_p.crossJoin(F.broadcast(nq))
        .select(
            "nprobe",
            "n_queries",
            "n_results",
            "n_hits",
            F.expr(
                f"CAST({EVAL_SCALE} * n_hits"
                f" DIV nullif(n_queries * {K}, 0) AS BIGINT)"
            ).alias("recall_at_k_micro"),
        )
        .orderBy("nprobe")
    )


_CENT_COS = (
    f"1.0 - {_DOT.format(a='q.qv', b='c.cvec')} / "
    f"({_NORM.format(a='q.qv')} * {_NORM.format(a='c.cvec')})"
)
_PROBE_COS = (
    f"1.0 - {_DOT.format(a='p.qv', b='e.v')} / "
    f"({_NORM.format(a='p.qv')} * {_NORM.format(a='e.v')})"
)

_RECALL_VS_NPROBE_SQL = (
    _BASE
    + f"""
, cd AS (
  SELECT label, t.i AS dim, round(avg(v[t.i]), 6) AS cval
  FROM e, unnest(range(1, len(v) + 1)) AS t(i)
  GROUP BY label, t.i
),
c AS (SELECT label, list(cval ORDER BY dim) AS cvec FROM cd GROUP BY label),
cells AS (
  SELECT q.query_id, q.qv, c.label,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY {_CENT_COS} ASC, c.label ASC) AS cell_rank
  FROM q CROSS JOIN c
),
p AS (SELECT * FROM cells WHERE cell_rank <= {max(NPROBE_CURVE)}),
probes(nprobe) AS (VALUES {", ".join(f"({x})" for x in NPROBE_CURVE)}),
cand AS (
  SELECT probes.nprobe, p.query_id, e.vec_id,
         row_number() OVER (PARTITION BY probes.nprobe, p.query_id
                            ORDER BY {_PROBE_COS} ASC, e.vec_id ASC) AS rn
  FROM p JOIN e ON e.label = p.label CROSS JOIN probes
  WHERE p.cell_rank <= probes.nprobe
),
topk AS (SELECT nprobe, query_id, vec_id FROM cand WHERE rn <= {K}),
scored AS (
  SELECT q.query_id, e.vec_id, {_COS} AS dist FROM e CROSS JOIN q
),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dist ASC, vec_id ASC) AS rk
    FROM scored) t WHERE rk <= {K}
),
nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q),
agg AS (
  SELECT nprobe, CAST(count(*) AS BIGINT) AS n_results,
         CAST(count(*) FILTER (WHERE EXISTS (
           SELECT 1 FROM exact x
           WHERE x.query_id = topk.query_id AND x.vec_id = topk.vec_id
         )) AS BIGINT) AS n_hits
  FROM topk GROUP BY nprobe
)
SELECT nprobe, n_queries, n_results, n_hits,
       CAST(({EVAL_SCALE} * n_hits) // nullif(n_queries * {K}, 0) AS BIGINT)
         AS recall_at_k_micro
FROM agg, nq ORDER BY nprobe
"""
)
