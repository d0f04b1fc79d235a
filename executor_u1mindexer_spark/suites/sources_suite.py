"""Sources/traversal suite: CSV/JSON interchange round-trips (sources/) and
the chunk-level traversal (operators/traverse.py — executor.py:86-88).

Round-trip queries write under /tmp/spark_graft_io (mode=overwrite, so
re-runs are idempotent) and read back; oracles read the original fixture —
equality proves the sink+scan lose nothing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from executor_u1mindexer_spark import sources, tables
from executor_u1mindexer_spark.operators import traverse

IO_DIR = "/tmp/spark_graft_io"


def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = tables.load(spark, sf_dir, "nation")
    path = os.path.join(IO_DIR, os.path.basename(sf_dir.rstrip("/")), "nation_csv")
    sources.write_table(nation, path, fmt="csv")
    back = sources.read_table(
        spark, path, fmt="csv", schema="n_nationkey int, n_name string, n_regionkey int"
    )
    return back.orderBy("n_nationkey")


def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = tables.load(spark, sf_dir, "region")
    path = os.path.join(IO_DIR, os.path.basename(sf_dir.rstrip("/")), "region_json")
    sources.write_table(region, path, fmt="json")
    back = sources.read_table(
        spark, path, fmt="json", schema="r_regionkey int, r_name string"
    )
    return back.orderBy("r_regionkey")


def source_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-by write + partition-pruned read: only one lang directory
    is scanned on read (the on-disk coarse index)."""
    docs = tables.load(spark, sf_dir, "documents")
    path = os.path.join(IO_DIR, os.path.basename(sf_dir.rstrip("/")), "docs_by_lang")
    sources.write_table(docs, path, fmt="parquet", partition_by=("lang",))
    back = sources.read_table(spark, path, fmt="parquet").filter(F.col("lang") == "en")
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )


def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan with a pushed filter — the second columnar format
    (same predicate-pushdown/column-pruning machinery as parquet)."""
    supplier = tables.load(spark, sf_dir, "supplier")
    path = os.path.join(IO_DIR, os.path.basename(sf_dir.rstrip("/")), "supplier_orc")
    sources.write_table(supplier, path, fmt="orc")
    back = sources.read_table(spark, path, fmt="orc").filter(F.col("s_acctbal") > 0)
    return back.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal").orderBy(
        "s_suppkey"
    )


def source_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the 100 TB table-maintenance op: a fragmented
    write (32 shards) rewritten to 4 right-sized files via coalesce (NOT
    repartition — coalesce merges map-side with zero shuffle), with proof
    nothing was lost: file counts from the filesystem, row count + checksum
    from the data. At scale this is the nightly job that keeps scan task
    counts sane (a million 1 MB files makes a 100 TB scan unschedulable)."""
    ev = tables.load(spark, sf_dir, "events")
    base = os.path.join(IO_DIR, os.path.basename(sf_dir.rstrip("/")))
    frag, compact = os.path.join(base, "events_frag"), os.path.join(base, "events_compact")
    ev.repartition(32).write.mode("overwrite").parquet(frag)
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    spark.read.parquet(frag).coalesce(4).write.mode("overwrite").parquet(compact)
    n_compact = len([f for f in os.listdir(compact) if f.endswith(".parquet")])
    back = spark.read.parquet(compact)
    return back.agg(
        F.lit(n_frag).alias("n_files_frag"),
        F.lit(n_compact).alias("n_files_compact"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("event_id")).alias("sum_ids"),
        F.sum(F.col("user_id")).alias("sum_users"),
    )


def traverse_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'c'-path traversal: explode the synthesized two-chunk split."""
    docs = traverse.with_chunks(tables.load(spark, sf_dir, "documents"))
    out = traverse.traverse_flat(docs, path="c")
    return out.select(
        "doc_id",
        "chunk_seq",
        F.size(F.split("chunk_text", r"\s+")).alias("chunk_words"),
        F.length("chunk_text").alias("chunk_chars"),
    )


def layout_zorder_clustering(spark, sf_dir):
    """Z-order data layout (r06, operators/layout.py — the Delta/Iceberg
    OPTIMIZE ZORDER story): rank-space-map (l_partkey, l_suppkey), Morton-
    interleave the bits, simulate 32 files per layout, and compare the
    per-file min/max spans that parquet pruning would read against the
    single-column sort layout. Pure integer output with the two layout-
    theorem booleans oracle-checked: z-order clusters the SECOND dimension
    (b-span strictly smaller than the by-a layout's), while the by-a sort
    keeps its own dimension at least as tight."""
    from executor_u1mindexer_spark.operators import layout as L

    li = tables.load(spark, sf_dir, "lineitem")
    return L.zorder_layout_stats(li, "l_partkey", "l_suppkey")


def layout_file_skipping(spark, sf_dir):
    """Data-skipping proof for the z-order layout (r07, the companion to
    layout_zorder_clustering): for three range predicates on l_suppkey
    (percent splits of its min/max range, computed in-plan), count how
    many simulated files each layout's per-file min/max stats force a
    scan to READ — the actual parquet-footer pruning decision. One
    integer row per predicate with the weak skipping theorem
    (z_not_worse_on_b) oracle-checked. r10: the Hilbert layout rides as
    a third arm (h_files_total/read + h_not_worse_on_b) — at sf0.1 both
    curves read 4-10 of 32 files where the single-column sort reads all
    32."""
    from executor_u1mindexer_spark.operators import layout as L

    li = tables.load(spark, sf_dir, "lineitem")
    return L.file_skipping_stats(li, "l_partkey", "l_suppkey")


def layout_hilbert_clustering(spark, sf_dir):
    """Hilbert-curve data layout (r10, operators/layout.py — the curve
    behind Delta liquid clustering): rank-space-map (l_partkey,
    l_suppkey) at 8 bits, walk the classic xy2d loop as 8 unrolled
    integer projection stages (the same fragment source emits Spark
    selectExpr stages and DuckDB CTE stages, so the curve index is
    bit-identical cross-engine), simulate 32 files under the Hilbert,
    Morton, and single-column layouts at the SAME granularity, and
    compare the per-file min/max span sums parquet pruning would read.
    Pure integer output with two oracle-checked booleans: Hilbert
    clusters the second dimension vs the single-column sort, and its
    combined spans tie-or-beat Morton's (the no-diagonal-jump locality
    advantage)."""
    from executor_u1mindexer_spark.operators import layout as L

    li = tables.load(spark, sf_dir, "lineitem")
    return L.hilbert_layout_stats(li, "l_partkey", "l_suppkey")


def source_schema_evolution(spark, sf_dir):
    """Schema-drift roundtrip (r10): batch 1 (even s_suppkey) writes the
    2-column supplier projection, batch 2 (odd keys) writes a WIDER
    3-column one (+s_acctbal), and the read merges both footprints with
    parquet mergeSchema — the union schema comes back with NULL backfill
    on the narrow batch's missing column, exactly the long-lived-table
    schema-evolution contract a 100 TB lake relies on. Row-level output
    so the backfill itself is oracle-checked, not just counts."""
    sup = tables.load(spark, sf_dir, "supplier")
    base = os.path.join(
        IO_DIR, os.path.basename(sf_dir.rstrip("/")), "supplier_evolve"
    )
    p1, p2 = os.path.join(base, "b1"), os.path.join(base, "b2")
    sup.filter(F.col("s_suppkey") % 2 == 0).select("s_suppkey", "s_name").write.mode(
        "overwrite"
    ).parquet(p1)
    sup.filter(F.col("s_suppkey") % 2 == 1).select(
        "s_suppkey", "s_name", "s_acctbal"
    ).write.mode("overwrite").parquet(p2)
    merged = spark.read.option("mergeSchema", "true").parquet(p1, p2)
    return merged.select("s_suppkey", "s_name", "s_acctbal").orderBy("s_suppkey")


_VARIANT_QUERIES = {
    "source_csv_roundtrip": source_csv_roundtrip,
    "layout_file_skipping": layout_file_skipping,
    "source_json_roundtrip": source_json_roundtrip,
    "source_partitioned_parquet": source_partitioned_parquet,
    "source_orc_roundtrip": source_orc_roundtrip,
    "source_compact_small_files": source_compact_small_files,
    "traverse_chunks": traverse_chunks,
    "layout_zorder_clustering": layout_zorder_clustering,
    "layout_hilbert_clustering": layout_hilbert_clustering,
    "source_schema_evolution": source_schema_evolution,
}

from executor_u1mindexer_spark.operators import layout as _L  # noqa: E402

_VARIANT_ORACLES = {
    "source_csv_roundtrip": "SELECT * FROM nation ORDER BY n_nationkey",
    "source_json_roundtrip": "SELECT * FROM region ORDER BY r_regionkey",
    "source_orc_roundtrip": """
SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
WHERE s_acctbal > 0 ORDER BY s_suppkey
""",
    "source_partitioned_parquet": """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE lang = 'en' GROUP BY lang
""",
    "source_compact_small_files": """
SELECT CAST(32 AS INT) AS n_files_frag,
       CAST(4 AS INT) AS n_files_compact,
       count(*) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS sum_ids,
       CAST(sum(user_id) AS BIGINT) AS sum_users
FROM events
""",
    "traverse_chunks": """
WITH t AS (
  SELECT doc_id, str_split_regex(text, '\\s+') AS toks,
         (len(str_split_regex(text, '\\s+')) + 1) // 2 AS h,
         len(str_split_regex(text, '\\s+')) AS n
  FROM documents
), c AS (
  SELECT doc_id, 0 AS chunk_seq, array_to_string(toks[1:h], ' ') AS chunk_text FROM t
  UNION ALL
  SELECT doc_id, 1, array_to_string(toks[h+1:n], ' ') FROM t
)
SELECT doc_id, chunk_seq,
       len(str_split_regex(chunk_text, '\\s+')) AS chunk_words,
       length(chunk_text) AS chunk_chars
FROM c
""",
    "layout_zorder_clustering": _L.oracle_zorder_stats_sql(
        "lineitem", "l_partkey", "l_suppkey"
    ),
    "layout_file_skipping": _L.oracle_file_skipping_sql(
        "lineitem", "l_partkey", "l_suppkey"
    ),
    "layout_hilbert_clustering": _L.oracle_hilbert_stats_sql(
        "lineitem", "l_partkey", "l_suppkey"
    ),
    "source_schema_evolution": """
SELECT s_suppkey, s_name,
       CASE WHEN s_suppkey % 2 = 1 THEN s_acctbal END AS s_acctbal
FROM supplier ORDER BY s_suppkey
""",
}


# -- registry folding (VERDICT r09 #3) ----------------------------------------
# The three format roundtrips (csv/json/orc — each a write-then-read of a
# small dimension table through operators/sources.py) fold into one
# parameterized twin; each arm still runs its full write+read cycle.

from executor_u1mindexer_spark.suites import _fold as FD

FAMILIES = {
    "source_format_roundtrips": [
        ("source_csv_roundtrip", ["n_nationkey"],
         ["n_name", "n_regionkey"], {"strings": {"n_name"}}),
        ("source_json_roundtrip", ["r_regionkey"],
         ["r_name"], {"strings": {"r_name"}}),
        ("source_orc_roundtrip", ["s_suppkey"],
         ["s_name", "s_nationkey", "s_acctbal"], {"strings": {"s_name"}}),
    ],
}

FOLDED_HERE = ("source_csv_roundtrip", "source_json_roundtrip", "source_orc_roundtrip")

QUERIES = {k: v for k, v in _VARIANT_QUERIES.items() if k not in FOLDED_HERE}
ORACLES = {k: v for k, v in _VARIANT_ORACLES.items() if k not in FOLDED_HERE}
for _fam, _members in FAMILIES.items():
    QUERIES[_fam], ORACLES[_fam] = FD.fold_family(
        _fam, _members, _VARIANT_QUERIES, _VARIANT_ORACLES
    )
