"""Remaining TPC-H query shapes (Q2/Q7/Q8/Q9/Q11/Q12/Q13/Q15/Q16/Q17/Q19/
Q20/Q21/Q22) — completing the 22-query suite started in relational_suite.py.

The reference has no relational surface (executor.py delegates all compute
to hnswlib); this suite is [NOT IN REFERENCE] breadth: each query keeps the
*optimizer shape* that makes the original interesting — correlated scalar-min
subquery (Q2), two-sided dimension filters (Q7), market-share ratio (Q8),
profit expression over a 4-way join (Q9), group-vs-global-scalar HAVING
(Q11), conditional counts (Q12), outer-join histogram (Q13), view + scalar
max (Q15), NOT-IN anti join + count-distinct (Q16), correlated AVG (Q17),
disjunctive pushdown (Q19), aggregate-gated semi join (Q20), EXISTS +
NOT-EXISTS on the same fact (Q21), global-average anti-join rollup (Q22).

Fixture adaptations (the driver fixture has no partsupp table and lacks
comment/phone/shipmode/commitdate columns — TESTDATA.md):
- "supply cost" := l_extendedprice (Q2/Q15-style min-cost) or
  0.6 * p_retailprice * l_quantity (Q9/Q11 value), computed from lineitem;
- "late" := l_shipdate > o_orderdate + 90 days (Q21; same device as Q4);
- Q12's shipmode groups by l_linestatus; Q13's comment filter becomes an
  o_orderpriority filter; Q16's complaint-supplier NOT IN becomes
  s_acctbal < 0; Q22's phone prefixes become nation keys 0-6.

Determinism policy (same as relational_suite.py): money sums aggregate in
exact decimal(18,6) and cast to double only at the output boundary;
conditional COUNTs use count(CASE WHEN ... THEN 1 END) in BOTH engines so
the oracle side stays BIGINT (a bare sum of ints is HUGEINT in DuckDB — the
r02 hash-failure class); every ORDER BY under a LIMIT carries a unique
tiebreaker.

Scale notes: every dim side (part/supplier/nation/customer filtered)
broadcasts; the only shuffles are the fact-fact lineitem ⋈ orders joins and
the grouped aggregates, which AQE re-plans at runtime. Scalar gates (total
value in Q11, max revenue in Q15, average balance in Q22) are 1-row
aggregates cross-joined broadcast — no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from executor_u1mindexer_spark import tables

# The decimal(18,6) money-cast convention is determinism-critical (module
# docstring) and defined ONCE in relational_suite — shared here so a policy
# change cannot leave half the TPC-H suite on a stale precision.
from executor_u1mindexer_spark.suites.relational_suite import _dec
from executor_u1mindexer_spark.suites.relational_suite import _DISC as _DISC_SQL


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


def _rev() -> Column:
    """Lazy: building a Column requires an active SparkContext (PySpark 4)."""
    return _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape — correlated scalar-min subquery: for each LARGE part of
    size ≤ 15, the suppliers that ship it at the part's minimum extended price
    (fixture stand-in for min ps_supplycost; no partsupp table). Catalyst
    plans the correlation as grouped-min + equality join-back; part filter
    broadcasts so lineitem is pruned before the min."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    min_cost = li.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("l_extendedprice").alias("min_cost")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    out = (
        li.join(
            F.broadcast(min_cost),
            (F.col("l_partkey") == F.col("mk"))
            & (F.col("l_extendedprice") == F.col("min_cost")),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "min_cost")
        .distinct()
    )
    return out.orderBy(
        F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
    )


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape — volume shipped between two nations in either direction:
    revenue by (supplier nation, customer nation, ship year). Two renamed
    broadcast copies of nation; the pair filter is a disjunction over both
    directions; lineitem ⋈ orders is the only shuffle."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    out = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )
    return out.orderBy("supp_nation", "cust_nation", "l_year")


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape — national market share: NATION_3 suppliers' share of
    ECONOMY-part revenue sold to ASIA customers, per order year. The share
    is a conditional-sum ratio; both sums aggregate in exact decimal and
    divide once (double) at the output."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    supp = _t(spark, sf_dir, "supplier")
    zero = F.lit(0).cast("decimal(18,6)")
    out = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(zero))
            .cast("double")
            .alias("nation_revenue"),
            F.sum(_rev()).cast("double").alias("total_revenue"),
        )
    )
    return out.select(
        "o_year",
        F.round(F.col("nation_revenue") / F.col("total_revenue"), 9).alias("mkt_share"),
        "nation_revenue",
        "total_revenue",
    ).orderBy("o_year")


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape — product-type profit by supplier nation and order year over
    parts whose name contains 'red'. Profit = revenue − 0.6·p_retailprice·qty
    (fixture stand-in for ps_supplycost·qty). One lineitem ⋈ orders shuffle;
    part/supplier/nation broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    profit = _dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    out = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )
    return out.orderBy("n_name", F.col("o_year").desc())


def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape — parts whose stocked value via NATION_5 suppliers exceeds
    a fraction of the nation's total (group-vs-global-scalar HAVING). The
    global total aggregates the SAME decimal base (never a re-sum of the
    per-group doubles — that would be order-dependent) and cross-joins
    broadcast as a 1-row gate. The fraction is 5/n_lineitems — the TPC-H
    original divides its fraction by SF for exactly this reason; deriving
    it from the measured row count keeps the HAVING non-vacuous at every
    scale (a fixed 0.001 returned 0 rows at sf0.1)."""
    supp5 = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(supp5), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    value = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    grouped = li.groupBy("l_partkey").agg(F.sum(value).cast("double").alias("part_value"))
    total = li.agg(
        F.sum(value).cast("double").alias("total_value"),
        F.count(F.lit(1)).alias("n_li"),
    )
    out = (
        grouped.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * (5.0 / F.col("n_li")))
        .select("l_partkey", "part_value")
    )
    return out.orderBy(F.col("part_value").desc(), "l_partkey")


def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape — conditional counts of urgent vs other orders per lineitem
    status for 1997 shipments (l_linestatus stands in for the missing
    l_shipmode). count(CASE...) in both engines keeps the oracle BIGINT."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    out = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(urgent, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~urgent, F.lit(1))).alias("low_line_count"),
        )
    )
    return out.orderBy("l_linestatus")


def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape — customer order-count histogram: LEFT OUTER customer ⋈
    orders (priority filter inside the join, so zero-order customers
    survive), count per customer, then a second aggregate over the counts.
    Two shuffles by construction (custkey, then c_count)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    out = per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))
    return out.orderBy(F.col("custdist").desc(), F.col("c_count").desc())


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape — top supplier by quarterly revenue: the revenue view is a
    grouped aggregate, the max is a 1-row scalar cross-joined broadcast, and
    the winner(s) join back by revenue equality (exact: both engines derive
    the double from the same exact decimal sum)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).cast("double").alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = _t(spark, sf_dir, "supplier")
    out = (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )
    return out.orderBy("s_suppkey")


def tpch_q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape — distinct supplier counts per (brand, type, size) for the
    distinct part-supplier pairs observed in lineitem (no partsupp table),
    excluding negative-balance suppliers via an anti join (the NOT IN
    complaint-supplier subquery stand-in)."""
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    out = (
        pairs.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
    return out.orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")


def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape — revenue from small-quantity orders of Brand#3 parts: the
    correlated AVG subquery becomes a grouped per-part average joined back;
    the average divides the exact decimal quantity sum (double) by the count
    so both engines derive the identical threshold."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    out = (
        li.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )
    return out


def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape — revenue under an OR of three AND-groups spanning both
    join sides (brand × size × quantity bands). The disjunction lives in the
    join condition; Catalyst still pushes the partkey equi-condition down to
    a broadcast hash join with the residual OR as a post-filter."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (F.col("l_partkey") == F.col("p_partkey")) & (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return li.join(F.broadcast(part), cond).agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape — suppliers who shipped more than 300 units of 'red' parts
    in 1997: an aggregate-gated semi join chain (grouped HAVING gates which
    suppliers reach the supplier ⋈ nation lookup)."""
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red")).select(
        "p_partkey"
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    shipped = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    out = (
        shipped.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name", "total_qty")
    )
    return out.orderBy("s_name")


def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape — suppliers who were the ONLY late supplier on a finished
    multi-supplier order: EXISTS (another supplier on the order) + NOT
    EXISTS (another LATE supplier) over the same fact. Late := shipped >90
    days after the order date (fixture device, same as Q4). The fact is
    pre-aggregated to one row per (order, supplier) so the semi/anti probes
    and the count agree between engines."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("int")
    per_os = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
        .agg(F.max(late).alias("late"))
    )
    # r16 (guide §2.1/§3.2): the semi/anti probes re-evaluated the whole
    # per_os subtree (lineitem ⋈ orders + groupBy) twice more and paid
    # two orderkey SMJs. Both probes are per-order COUNTS over the very
    # frame being probed: EXISTS(another supplier) ⟺ the order has >= 2
    # suppliers, and NOT EXISTS(another late supplier) ⟺ the order has
    # exactly 1 late supplier (the candidate itself is late). One
    # order-partitioned window over ONE evaluation of per_os replaces
    # 3 evaluations + semi SMJ + anti SMJ.
    from pyspark.sql import Window

    w_ok = Window.partitionBy("ok")
    waiting = (
        per_os.withColumn("__n_supp", F.count(F.lit(1)).over(w_ok))
        .withColumn("__n_late", F.sum("late").over(w_ok))
        .filter(
            (F.col("late") == 1)
            & (F.col("__n_supp") >= 2)
            & (F.col("__n_late") == 1)
        )
        .select("ok", "sk")
    )
    supp = _t(spark, sf_dir, "supplier")
    out = (
        waiting.join(F.broadcast(supp), F.col("sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return out.orderBy(F.col("numwait").desc(), "s_name").limit(20)


def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape — well-funded customers in nations 0-6 (phone-prefix
    stand-in) with no RECENT orders (every fixture customer has some order,
    so 'lapsed since 2000' keeps the anti join non-vacuous): the
    positive-balance average is a 1-row scalar cross-joined broadcast, the
    no-orders test an anti join, rolled up per nation."""
    sel = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") <= 6)
    avg_bal = sel.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    out = (
        sel.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
    return out.orderBy("c_nationkey")


QUERIES = {
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q7_volume_shipping": tpch_q7_volume_shipping,
    "tpch_q8_market_share": tpch_q8_market_share,
    "tpch_q9_product_profit": tpch_q9_product_profit,
    "tpch_q11_important_parts": tpch_q11_important_parts,
    "tpch_q12_priority_shipping": tpch_q12_priority_shipping,
    "tpch_q13_customer_distribution": tpch_q13_customer_distribution,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q16_part_supplier_counts": tpch_q16_part_supplier_counts,
    "tpch_q17_small_qty_revenue": tpch_q17_small_qty_revenue,
    "tpch_q19_disjunctive_revenue": tpch_q19_disjunctive_revenue,
    "tpch_q20_excess_suppliers": tpch_q20_excess_suppliers,
    "tpch_q21_waiting_suppliers": tpch_q21_waiting_suppliers,
    "tpch_q22_global_sales_opportunity": tpch_q22_global_sales_opportunity,
}

ORACLES = {
    "tpch_q2_min_cost_supplier": """
SELECT DISTINCT s_acctbal, s_name, n_name, p.p_partkey, p_name,
       l_extendedprice AS min_cost
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p_type = 'LARGE' AND p_size <= 15
  AND l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem l2
                         WHERE l2.l_partkey = p.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p.p_partkey
""",
    "tpch_q7_volume_shipping": f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(sum({_DISC_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
    "tpch_q8_market_share": f"""
WITH all_rows AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN {_DISC_SQL}
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS nation_revenue,
         CAST(sum({_DISC_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY 1)
SELECT o_year, round(nation_revenue / total_revenue, 9) AS mkt_share,
       nation_revenue, total_revenue
FROM all_rows ORDER BY o_year
""",
    "tpch_q9_product_profit": """
SELECT n_name, year(o_orderdate) AS o_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY n_name, o_year DESC
""",
    "tpch_q11_important_parts": f"""
WITH nat5_li AS (
  SELECT l_partkey, {_DISC_SQL} AS value
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_name = 'NATION_5'))
SELECT l_partkey, CAST(sum(value) AS DOUBLE) AS part_value
FROM nat5_li
GROUP BY l_partkey
HAVING CAST(sum(value) AS DOUBLE) >
       (SELECT CAST(sum(value) AS DOUBLE) * (5.0 / count(*)) FROM nat5_li)
ORDER BY part_value DESC, l_partkey
""",
    "tpch_q12_priority_shipping": """
SELECT l_linestatus,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
         AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    "tpch_q13_customer_distribution": """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    "tpch_q15_top_supplier": f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(sum({_DISC_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    "tpch_q16_part_supplier_counts": """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    "tpch_q17_small_qty_revenue": """
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'),
avg_qty AS (
  SELECT l_partkey AS ak,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty
  FROM brand_li GROUP BY l_partkey)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly,
       count(*) AS n_small
FROM brand_li JOIN avg_qty ON l_partkey = ak
WHERE l_quantity < 0.2 * avg_qty
""",
    "tpch_q19_disjunctive_revenue": f"""
SELECT CAST(sum({_DISC_SQL}) AS DOUBLE) AS revenue, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
    "tpch_q20_excess_suppliers": """
WITH shipped AS (
  SELECT l_suppkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
  GROUP BY l_suppkey
  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 300)
SELECT s_name, n_name, total_qty
FROM shipped
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY s_name
""",
    "tpch_q21_waiting_suppliers": """
WITH per_os AS (
  SELECT l_orderkey AS ok, l_suppkey AS sk,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2)
SELECT s_name, count(*) AS numwait
FROM per_os l1 JOIN supplier ON l1.sk = s_suppkey
WHERE l1.late = 1
  AND EXISTS (SELECT 1 FROM per_os l2 WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
  AND NOT EXISTS (SELECT 1 FROM per_os l3
                  WHERE l3.ok = l1.ok AND l3.sk <> l1.sk AND l3.late = 1)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    "tpch_q22_global_sales_opportunity": """
WITH sel AS (SELECT * FROM customer WHERE c_nationkey <= 6),
avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_bal
  FROM sel WHERE c_acctbal > 0)
SELECT c_nationkey, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM sel, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
}
