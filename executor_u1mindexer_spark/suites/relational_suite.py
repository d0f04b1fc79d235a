"""Relational-analytics suite over the TPC-H-ish star schema (SURVEY.md §2.B).

The reference has no relational surface (its joins are implicit keyed-dict
lookups, executor.py:116/154/186/221); these operators are the
[NOT IN REFERENCE] breadth mandated by the north star, expressed entirely
with built-in Catalyst operators so every plan keeps predicate pushdown,
column pruning, partial aggregation, and AQE.

Determinism policy for the driver's value-hash:
- money/quantity sums are cast to decimal(18,6) BEFORE aggregation — decimal
  addition is exact and order-independent, immune to partition order (double
  sums are not associative);
- derived averages divide the exact decimal sum as double by the count —
  one deterministic double division per output row;
- every ORDER BY carries a unique tiebreaker key.

Scale notes: dim tables (region/nation/customer/supplier/part) broadcast;
fact-fact joins (lineitem x orders) shuffle on the join key and benefit from
AQE skew handling; rollup/cube use Spark's native grouping-sets expansion
(partial aggregation per grouping set, no multi-pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from executor_u1mindexer_spark import tables


def _dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,6)")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


# -- grouped aggregation (TPC-H Q1 shape) -----------------------------------

def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: grouped sums/avgs/count over lineitem with a shipdate
    predicate that pushes down to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    # Aggregate in exact decimal (order-independent), then cast the FINAL
    # column to double: the driver's value hash compares Python Decimal vs
    # DuckDB float64 by representation, so decimal must not reach the output.
    out = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("sum_disc_price"),
        F.sum(
            _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")))
        )
        .cast("double")
        .alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        F.round(F.col("sum_qty") / F.col("count_order"), 9).alias("avg_qty"),
        F.round(F.col("sum_base_price") / F.col("count_order"), 9).alias("avg_price"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (dates shifted into the fixture's range): a pure
    scan-filter-aggregate with ALL three predicates pushed to the parquet
    scan — the canonical pushdown showcase; no shuffle except the 1-row
    final aggregate. Decimal sum keeps the result partition-order
    independent; double only at the output boundary."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# -- multi-join analytics (Q3/Q5 shapes) -------------------------------------

def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem with selective predicates; top 10 orders
    by revenue. customer broadcasts; orders⋈lineitem is the only shuffle."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15"))
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
    )
    return out.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc()).limit(10)


def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way star join down to region; revenue per nation. Every dim side
    broadcasts (nation/region/supplier/customer are tiny at any SF)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
    )
    return out.orderBy(F.col("revenue").desc(), F.col("n_name").asc())


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer. The
    only shuffle is lineitem ⋈ orders + the customer-grained aggregate;
    customer and nation broadcast. Top 20 by revenue (TakeOrderedAndProject,
    no global sort)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01")) & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
    )
    return out.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional aggregation over
    lineitem ⋈ broadcast(part); one shuffle (the 1-row final agg). Both
    sums are exact decimals; ONE double division at the output."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01")) & (F.col("l_shipdate") < F.lit("1997-09-01"))
    )
    part = _t(spark, sf_dir, "part")
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    out = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,6)")))
        .cast("double")
        .alias("promo_revenue"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )
    return out.select(
        F.round(F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 9).alias(
            "promo_pct"
        ),
        "promo_revenue",
        "total_revenue",
    )


def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (fixture-adapted: the fixture lineitem has no
    commit/receipt dates, so 'late' := shipped after the order date):
    count 1996 orders per priority having AT LEAST ONE late lineitem — a
    correlated-inequality EXISTS, planned as a left-SEMI equi-join on
    orderkey with the l_shipdate > o_orderdate condition evaluated inside
    the join. One join shuffle + one grouped agg; semi-join means lineitem
    rows never multiply the output."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    hit = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 150. The
    HAVING-subquery is a grouped aggregate over lineitem re-joined to
    orders+customer — Catalyst plans the semi-filter as a plain join on
    the aggregated (small) side, so the big lineitem table shuffles once
    for the groupBy and the survivors broadcast upward."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    out = (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )
    return out.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc()).limit(100)


def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dim: lineitem volume per part brand."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy("p_brand")
    )


def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers that have at least one high-value order
    (the reference's membership predicate shape, executor.py:154)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no HIGH-VALUE order (executor.py:221
    shape). The price filter keeps the check non-vacuous: every fixture
    customer has SOME order, so an unfiltered anti join returns 0 rows and
    proves nothing — this is the exact complement of the semi twin."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


# -- grouping sets / rollup / cube -------------------------------------------

def rollup_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


def cube_orderstatus_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        )
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


# -- window functions ---------------------------------------------------------

def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total — sequential in-order fold,
    deterministic in both engines."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        F.row_number().over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")).alias("order_seq"),
    )


def window_rank_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/lag/lead over customers per nation by account balance."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return cust.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.lag("c_custkey", 1).over(w).alias("prev_cust"),
        F.lead("c_custkey", 1).over(w).alias("next_cust"),
    )


# -- sorts / top-k / set ops ---------------------------------------------------

def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — Spark plans TakeOrderedAndProject (per-partition heap +
    driver merge, no full sort at 100 TB)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(25)
    )


def set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer key sets, tagged by op."""
    cust = _t(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    u = building.union(rich).distinct().withColumn("op", F.lit("union"))
    i = building.intersect(rich).withColumn("op", F.lit("intersect"))
    e = building.exceptAll(rich).distinct().withColumn("op", F.lit("except"))
    return u.unionByName(i).unionByName(e)


# -- scalar function coverage ---------------------------------------------------

def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("type_devowel"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
    )


def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        # DATE, not the raw date_trunc timestamp: month-start is always
        # midnight so the cast is lossless, and the fold's date lane
        # rejects timestamps (ADVICE r10 — silent time-of-day truncation)
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
    )


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL) checked as an invariant: the raw sketch
    value is engine-specific, so the hashed output is the exact count plus a
    boolean asserting the approximation landed within ±10% — checkable by an
    oracle that emits the exact count and TRUE."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    return agg.select(
        "exact_parts",
        (
            (F.col("approx") >= F.col("exact_parts") * 0.9)
            & (F.col("approx") <= F.col("exact_parts") * 1.1)
        ).alias("approx_within_10pct"),
    )


_VARIANT_QUERIES = {
    "tpch_q1_pricing_summary": tpch_q1_pricing_summary,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "tpch_q5_local_supplier_volume": tpch_q5_local_supplier_volume,
    "tpch_q10_returned_items": tpch_q10_returned_items,
    "tpch_q14_promo_revenue": tpch_q14_promo_revenue,
    "tpch_q4_order_priority": tpch_q4_order_priority,
    "tpch_q18_large_volume_customer": tpch_q18_large_volume_customer,
    "join_broadcast_dim": join_broadcast_dim,
    "join_semi_customers_with_orders": join_semi_customers_with_orders,
    "join_anti_customers_without_orders": join_anti_customers_without_orders,
    "rollup_returnflag_linestatus": rollup_returnflag_linestatus,
    "cube_orderstatus_priority": cube_orderstatus_priority,
    "window_running_sum": window_running_sum,
    "window_rank_lag_lead": window_rank_lag_lead,
    "topk_orders_by_price": topk_orders_by_price,
    "set_ops_customer_segments": set_ops_customer_segments,
    "scalar_string_funcs": scalar_string_funcs,
    "scalar_date_funcs": scalar_date_funcs,
    "agg_approx_distinct": agg_approx_distinct,
}

_DISC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"

_VARIANT_ORACLES = {
    "tpch_q1_pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum({_DISC}) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 9) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 9) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "tpch_q6_forecast_revenue": """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
""",
    "tpch_q3_shipping_priority": f"""
SELECT l_orderkey, o_orderdate, o_orderpriority, CAST(sum({_DISC}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    "tpch_q5_local_supplier_volume": f"""
SELECT n_name, CAST(sum({_DISC}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
""",
    "tpch_q10_returned_items": f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum({_DISC}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    "tpch_q14_promo_revenue": f"""
WITH s AS (
  SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_DISC}
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS promo_revenue,
         CAST(sum({_DISC}) AS DOUBLE) AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-09-01'
)
SELECT round(100.0 * promo_revenue / total_revenue, 9) AS promo_pct,
       promo_revenue, total_revenue
FROM s
""",
    "tpch_q4_order_priority": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    "tpch_q18_large_volume_customer": """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 150
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
    "join_broadcast_dim": """
SELECT p_brand, count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
""",
    "join_semi_customers_with_orders": """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
""",
    "join_anti_customers_without_orders": """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
""",
    "rollup_returnflag_linestatus": """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    "cube_orderstatus_priority": """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    "window_running_sum": """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
""",
    "window_rank_lag_lead": """
SELECT c_nationkey, c_custkey, c_acctbal,
       rank() OVER w AS bal_rank,
       dense_rank() OVER w AS bal_dense_rank,
       lag(c_custkey, 1) OVER w AS prev_cust,
       lead(c_custkey, 1) OVER w AS next_cust
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
""",
    "topk_orders_by_price": """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
""",
    "set_ops_customer_segments": """
WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
SELECT c_custkey, 'union' AS op FROM (SELECT c_custkey FROM building UNION SELECT c_custkey FROM rich)
UNION ALL
SELECT c_custkey, 'intersect' AS op FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM rich)
UNION ALL
SELECT DISTINCT c_custkey, 'except' AS op FROM (SELECT c_custkey FROM building EXCEPT ALL SELECT c_custkey FROM rich)
""",
    "scalar_string_funcs": """
SELECT p_partkey,
       lower(p_name) AS name_lower,
       upper(p_brand) AS brand_upper,
       length(p_name) AS name_len,
       substring(p_name, 1, 5) AS name_head,
       regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_devowel,
       concat_ws('|', p_brand, p_type) AS brand_type,
       str_split(p_name, ' ')[1] AS first_word
FROM part
""",
    "scalar_date_funcs": """
SELECT o_orderkey,
       year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       day(o_orderdate) AS order_day,
       quarter(o_orderdate) AS order_quarter,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
FROM orders
""",
    # HLL sketch values are engine-specific, so the hashed surface is the
    # exact count plus the ±10% accuracy invariant (always true for Spark's
    # default rsd=0.05 at fixture cardinalities).
    "agg_approx_distinct": """
SELECT count(DISTINCT l_partkey) AS exact_parts, TRUE AS approx_within_10pct
FROM lineitem
""",
}


# -- registry folding (VERDICT r09 #3) ----------------------------------------
# Seven rows from this module fold into the cross-module family twins
# registered in relational_extra_suite (window_funcs / scalar_funcs /
# grouping_analytics / agg_approx_family); they are exported via the
# _VARIANT_* dicts and excluded from this module's public registry. The
# builder functions and oracle SQL remain importable and pytest-covered.
FOLDED_HERE = (
    "rollup_returnflag_linestatus",
    "cube_orderstatus_priority",
    "window_running_sum",
    "window_rank_lag_lead",
    "scalar_string_funcs",
    "scalar_date_funcs",
    "agg_approx_distinct",
)

QUERIES = {k: v for k, v in _VARIANT_QUERIES.items() if k not in FOLDED_HERE}
ORACLES = {k: v for k, v in _VARIANT_ORACLES.items() if k not in FOLDED_HERE}
