"""Z-order layout (operators/layout.py): Morton-code correctness, rank-
space mapping, and the layout theorem on a synthetic uniform grid."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from executor_u1mindexer_spark.operators import layout as L


def _morton_py(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_morton_interleave_matches_python(spark):
    rows = [(a, b) for a in (0, 1, 5, 170, 255) for b in (0, 3, 77, 128, 255)]
    df = spark.createDataFrame(rows, "a long, b long")
    expr = L.morton_interleave_sql("a", "b", 8, "spark")
    got = {(r.a, r.b): r.z for r in df.select("a", "b", F.expr(expr).alias("z")).collect()}
    for (a, b), z in got.items():
        assert z == _morton_py(a, b, 8), (a, b)


def test_rank_space_map_is_uniform_and_order_preserving(spark):
    df = spark.createDataFrame([(v,) for v in (3, 30, 7, 1000, 7, 3)], "x long")
    got = {r.value: r.mapped for r in L.rank_space_map(df, "x", 4).collect()}
    # 4 distinct values spread over [0, 16): ranks 1..4 -> 0, 4, 8, 12
    assert got == {3: 0, 7: 4, 30: 8, 1000: 12}


def test_zorder_theorem_on_uniform_grid(spark):
    # 64x64 uniform grid: z-order must cluster BOTH dims; the by-a sort
    # keeps a-spans tighter but leaves b-spans at the full range
    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    r = L.zorder_layout_stats(df, "a", "b", bits=6, n_bucket_bits=4).collect()[0]
    assert r.zorder_clusters_b
    assert r.single_dim_wins_own_dim
    # quantified: 16 z-buckets each cover a 16x16 tile of the 64x64 rank
    # space -> per-bucket spans well below the full 2^6 range
    assert r.z_sum_b_span < r.a_sum_b_span / 2


def test_morton_validates_bits():
    with pytest.raises(ValueError, match="bits"):
        L.morton_interleave_sql("a", "b", 0, "spark")
