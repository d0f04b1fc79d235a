"""Sketch suite (operators/sketch.py): HyperLogLog distinct counting.

Every oracle below is generated from the SAME SQL fragment source as the
Spark implementation (operators/sketch.py), so the register states and
estimates match the DuckDB oracle bit-for-bit — see the module docstring
for the determinism engineering. The registered scale points (p, column)
are chosen so the linear-counting correction branch (the one op without a
cross-engine bit guarantee) never triggers at sf0.01/sf0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from executor_u1mindexer_spark import tables
from executor_u1mindexer_spark.operators import sketch as SK

P_REGISTERS = 10  # user_id register state: <= 1024 rows, hash-exact
P_EVENTS = 10  # event_id estimate: n ~ 10k/100k >> 2.5 * 1024, no correction
P_USERS = 5  # user_id estimate: n = 150/1500 > 2.5 * 32, no correction
# pass/fail band for the estimate: 5 sigma with sigma ~= 1.04 / sqrt(m)
_BOUND = {p: repr(5.0 * 1.04 / (1 << p) ** 0.5) for p in (P_EVENTS, P_USERS)}


def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw mergeable sketch state over events.user_id — the artifact a
    100 TB rollup pipeline would persist per day/partition and merge later.
    Integer-only output, bit-exact vs the oracle."""
    events = tables.load(spark, sf_dir, "events")
    return SK.hll_registers(events, "user_id", P_REGISTERS)


def _with_accuracy(est: DataFrame, exact: DataFrame, p: int) -> DataFrame:
    return est.crossJoin(exact).select(
        "est_distinct",
        "n_zero_registers",
        "exact_distinct",
        F.expr(
            "abs(est_distinct - exact_distinct) / exact_distinct "
            f"<= {_BOUND[p]}"
        ).alias("rel_err_ok"),
    )


def sketch_hll_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimate of distinct event_id (p=10, ~3.25% sigma) next to the
    exact count and a 5-sigma accuracy verdict."""
    events = tables.load(spark, sf_dir, "events")
    est = SK.hll_distinct(events, "event_id", P_EVENTS)
    exact = events.agg(F.countDistinct("event_id").alias("exact_distinct"))
    return _with_accuracy(est, exact, P_EVENTS)


def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract at a deliberately tiny m=32 (p=5, ~18% sigma) over the
    low-cardinality user_id column — the small-register regime."""
    events = tables.load(spark, sf_dir, "events")
    est = SK.hll_distinct(events, "user_id", P_USERS)
    exact = events.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return _with_accuracy(est, exact, P_USERS)


def sketch_hll_merge_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability, the property that makes HLL a 100 TB operator: the
    per-register max of two disjoint half-sketches must equal the sketch of
    the whole table EXACTLY (max is associative/commutative/idempotent)."""
    events = tables.load(spark, sf_dir, "events")
    even = events.filter(F.col("event_id") % 2 == 0)
    odd = events.filter(F.col("event_id") % 2 == 1)
    merged = SK.hll_merge(
        SK.hll_registers(even, "user_id", P_REGISTERS),
        SK.hll_registers(odd, "user_id", P_REGISTERS),
    )
    whole = SK.hll_registers(events, "user_id", P_REGISTERS)
    j = merged.alias("m").join(whole.alias("w"), "register", "full_outer")
    mismatch = (
        F.col("m.max_rank").isNull()
        | F.col("w.max_rank").isNull()
        | (F.col("m.max_rank") != F.col("w.max_rank"))
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        (F.sum(mismatch.cast("long")) == 0).alias("merged_equals_whole"),
    )


QUERIES = {
    "sketch_hll_registers": sketch_hll_registers,
    "sketch_hll_distinct_events": sketch_hll_distinct_events,
    "sketch_hll_distinct_users": sketch_hll_distinct_users,
    "sketch_hll_merge_partitions": sketch_hll_merge_partitions,
}


def _estimate_oracle(col: str, p: int) -> str:
    est = SK.oracle_estimate_sql("events", col, p)
    return f"""
WITH est AS ({est}),
exact AS (SELECT CAST(count(DISTINCT {col}) AS BIGINT) AS exact_distinct
          FROM events WHERE {col} IS NOT NULL)
SELECT est_distinct, n_zero_registers, exact_distinct,
       (abs(est_distinct - exact_distinct) / exact_distinct <= {_BOUND[p]})
         AS rel_err_ok
FROM est CROSS JOIN exact
"""


_MERGE_ORACLE = f"""
WITH even_regs AS ({SK.oracle_registers_sql(
    "(SELECT * FROM events WHERE event_id % 2 = 0)", "user_id", P_REGISTERS)}),
odd_regs AS ({SK.oracle_registers_sql(
    "(SELECT * FROM events WHERE event_id % 2 = 1)", "user_id", P_REGISTERS)}),
merged AS (
  SELECT register, CAST(max(max_rank) AS BIGINT) AS max_rank
  FROM (SELECT * FROM even_regs UNION ALL SELECT * FROM odd_regs) u
  GROUP BY register
),
whole AS ({SK.oracle_registers_sql("events", "user_id", P_REGISTERS)})
SELECT CAST(count(*) AS BIGINT) AS n_registers,
       (CAST(sum(CASE WHEN m.max_rank IS NULL OR w.max_rank IS NULL
                        OR m.max_rank <> w.max_rank
                      THEN 1 ELSE 0 END) AS BIGINT) = 0) AS merged_equals_whole
FROM merged m FULL OUTER JOIN whole w USING (register)
"""


ORACLES = {
    "sketch_hll_registers": SK.oracle_registers_sql("events", "user_id", P_REGISTERS),
    "sketch_hll_distinct_events": _estimate_oracle("event_id", P_EVENTS),
    "sketch_hll_distinct_users": _estimate_oracle("user_id", P_USERS),
    "sketch_hll_merge_partitions": _MERGE_ORACLE,
}
