"""Property-based check (SURVEY.md §5.3): on arbitrary vector sets, the
engine's exact KNN equals a numpy brute force — metric semantics pinned to
hnswlib 0.5.2 (squared L2, 1-cos, 1-ip)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st


@st.composite
def corpus_and_query(draw):
    dim = draw(st.integers(min_value=2, max_value=8))
    n = draw(st.integers(min_value=2, max_value=12))
    vals = st.floats(min_value=-10, max_value=10, allow_nan=False, width=32)
    corpus = [draw(st.lists(vals, min_size=dim, max_size=dim)) for _ in range(n)]
    query = draw(st.lists(vals, min_size=dim, max_size=dim))
    metric = draw(st.sampled_from(["cosine", "euclidean", "inner_product"]))
    # cosine needs nonzero norms
    if metric == "cosine":
        corpus = [v if any(abs(x) > 1e-3 for x in v) else [1.0] * dim for v in corpus]
        if not any(abs(x) > 1e-3 for x in query):
            query = [1.0] * dim
    return corpus, query, metric


@settings(max_examples=8, deadline=None)
@given(corpus_and_query())
def test_knn_equals_numpy_bruteforce(spark, data):
    from pyspark.sql import functions as F  # noqa: F401

    from executor_u1mindexer_spark.operators import knn

    corpus, query, metric = data
    k = min(5, len(corpus))
    stored = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(corpus)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(0, [float(x) for x in query])], "query_id long, query_embedding array<double>"
    )
    got = [
        r.vec_id
        for r in knn.knn_search(stored, queries, k=k, metric=metric)
        .orderBy("rank")
        .collect()
    ]

    M = np.array(corpus, dtype=np.float64)
    q = np.array(query, dtype=np.float64)
    if metric == "cosine":
        d = 1.0 - (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    elif metric == "euclidean":
        d = ((M - q) ** 2).sum(axis=1)
    else:
        d = 1.0 - M @ q
    want = sorted(range(len(corpus)), key=lambda i: (d[i], i))[:k]
    # numpy summation order differs from the engine's sequential fold; at
    # near-ties (< 1e-9) either order is legitimate — compare distance
    # multisets with tolerance instead of forcing identical permutations
    got_d = sorted(d[i] for i in got)
    want_d = sorted(d[i] for i in want)
    assert np.allclose(got_d, want_d, rtol=0, atol=1e-9)
