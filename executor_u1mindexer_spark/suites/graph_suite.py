"""Graph suite (operators/graph.py): bounded-iteration PageRank and
triangle counting over the part co-occurrence graph.

Both rows are bit-exact against chained-CTE DuckDB replays — PageRank
because every operation is scaled-integer (SCALE=1e12 ranks, floor
divisions, integer damping), triangles because they are pure counts.
The edge list comes from ADJACENT lineitem lines of one order (bounded
per-order fan-out — the all-pairs-in-basket form would grow
quadratically with basket size; see operators/graph.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from executor_u1mindexer_spark import tables
from executor_u1mindexer_spark.operators import graph as G

PR_ITER = 5
PR_DAMPING = 85


def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-iteration damped PageRank over the part co-occurrence graph —
    one (node, rank_scaled) row per part with at least one edge. The
    iterative-algorithm family member alongside BPE training: each round
    is one edges-join-ranks shuffle + one grouped sum, state is one row
    per node, and the oracle replays all five rounds as chained CTEs."""
    li = tables.load(spark, sf_dir, "lineitem")
    edges = G.consecutive_line_edges(li)
    return G.pagerank(edges, PR_ITER, PR_DAMPING)


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-edge triangle count (a<b<c chains closed by the (a,c)
    edge) with node/edge totals — the classic two-self-join graph metric,
    intermediate bounded by sum of squared degrees."""
    li = tables.load(spark, sf_dir, "lineitem")
    return G.triangle_count(G.consecutive_line_edges(li))


QUERIES = {
    "graph_pagerank_parts": graph_pagerank_parts,
    "graph_triangle_count": graph_triangle_count,
}

ORACLES = {
    "graph_pagerank_parts": G.oracle_pagerank_sql(PR_ITER, PR_DAMPING),
    "graph_triangle_count": G.oracle_triangles_sql(),
}
