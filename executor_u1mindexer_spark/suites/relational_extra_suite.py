"""Second relational batch: scalar math, map columns, GROUPING SETS, range
join — the remaining §2.B scalar/join families.

Range-join scale note: the purchase-views join is an equi join on user_id
with a range predicate on ts — Catalyst plans the equi part as a hash/SMJ
shuffle join and applies the range as a post-join filter, so the quadratic
blow-up is bounded per user (never a global BNLJ).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from executor_u1mindexer_spark import tables
from executor_u1mindexer_spark.operators import pipeline as PIPE


def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/sqrt/pow/log/exp/round/sign over part prices — per-row double
    ops on identical inputs are bit-deterministic in both engines."""
    part = tables.load(spark, sf_dir, "part")
    p = F.col("p_retailprice")
    return part.select(
        "p_partkey",
        F.abs(p - 1000.0).alias("abs_centered"),
        F.sqrt(p).alias("sqrt_price"),
        (p * p).alias("price_sq"),  # not pow(x,2): JVM special-cases it to x*x, libm doesn't
        # ln is a libm transcendental — JVM and DuckDB differ by 1 ulp on
        # ~1% of inputs (not correctly-rounded); round both sides to 9dp
        F.round(F.log(p), 9).alias("ln_price"),
        F.round(p / 7.0, 3).alias("seventh_rounded"),
        F.signum(p - 1000.0).alias("sign_centered"),
        F.greatest(p, F.lit(500.0)).alias("floor_500"),
        F.least(p, F.lit(1500.0)).alias("cap_1500"),
    )


def map_column_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map column from event fields, then read it back with
    element_at / map_keys — MapType round-trip coverage."""
    ev = tables.load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        m.alias("attrs"),
    ).select(
        "event_id",
        F.element_at("attrs", "type").alias("attr_type"),
        F.element_at("attrs", "user").alias("attr_user"),
        F.size("attrs").alias("n_attrs"),
        F.array_join(F.map_keys("attrs"), ",").alias("key_list"),
    )


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer control than rollup/cube) via SQL with
    grouping_id to disambiguate the null rows."""
    tables.load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_priority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def _range_join_plain(ev: DataFrame) -> DataFrame:
    """Plain range-join core: equi on user_id, ts interval as a post-join
    residual — per-user fan-out is views(u) × purchases(u)."""
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") > F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy("purchase_id", "user_id", "purchase_ts").agg(
        F.count("view_ts").alias("views_last_hour")
    )


def _range_join_banded(ev: DataFrame) -> DataFrame:
    """Banded range-join core: (user, hour-bucket) equi key — each purchase
    explodes to its two candidate buckets, each view keeps one, so per-key
    fan-out is bounded by one hour of activity. Keys carry user_id through
    the count so replicated inputs (the amplified bench pair) cannot merge
    rows that share an event_id across users."""
    hour = F.lit(3600)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        (F.unix_timestamp("ts") / hour).cast("long").alias("__b"),
    )
    p_exp = p.withColumn("__bucket", F.explode(F.array(F.col("__b"), F.col("__b") - 1)))
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        (F.unix_timestamp("ts") / hour).cast("long").alias("__bucket"),
    )
    joined = p_exp.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (p_exp["__bucket"] == v["__bucket"])
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") > F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    counts = joined.groupBy("purchase_id", "user_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return (
        p.join(counts, ["purchase_id", "user_id"], "left")
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            F.coalesce("__n", F.lit(0)).alias("views_last_hour"),
        )
    )


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: views of the same user within the hour before each
    purchase (equi on user_id + ts interval predicate)."""
    return _range_join_plain(tables.load(spark, sf_dir, "events"))


def events_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of events_range_join: a BANDED interval join. The
    plain form joins on user_id alone and filters the ts interval AFTER the
    join — per-user fan-out is views(u) × purchases(u), quadratic in a hot
    user's activity. Banding adds the hour bucket to the join key: each
    purchase explodes to its two candidate view buckets (hour h and h-1 —
    any view within the trailing hour lies in one of them), each view keeps
    its single bucket, and the equi-join on (user, bucket) bounds fan-out
    to one hour of activity per key. Pairs stay unique (a view has ONE
    bucket; the two exploded buckets are distinct), so no dedup is needed.
    Result is IDENTICAL to events_range_join — same oracle, only the join
    geometry changes."""
    return _range_join_banded(tables.load(spark, sf_dir, "events"))


# The fixture's events table is small enough that BOTH range-join forms run
# in ~0.3-0.5 s of fixed overhead at sf0.1, inside the documented ±0.5 s
# host-noise band — which is why BENCH_r04 could not separate them even
# though the candidate-pair counts differ by 376x (267,846 plain vs 711
# banded at sf0.1). The amplified pair below scales the JOIN WORK (x32
# users via replica shift — same per-user density, the 100 TB growth
# axis) while collapsing the output to one row, so the structural
# difference dominates the fixed overhead and the driver's bench can
# finally see it.
RANGE_AMPLIFY = 32
# Replica shift must clear any plausible user_id domain: 1e9 (matching
# maintenance.SCD2_NEW_KEY_OFFSET's rationale) — a 1e6 shift would collide
# replicas with real ids at larger SFs and silently merge users, distorting
# the per-user density this pair is built to measure (ADVICE r05).


def _amplified_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(RANGE_AMPLIFY - 1)))
        )
        .withColumn(
            "user_id",
            F.col("user_id").cast("long")
            + F.col("__r").cast("long") * F.lit(1_000_000_000),
        )
        .drop("__r")
    )


def _range_join_summary(per_purchase: DataFrame) -> DataFrame:
    return per_purchase.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("views_last_hour").cast("long").alias("sum_views"),
        F.countDistinct("user_id").alias("n_users"),
    )


def events_range_join_amplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain range join over the x32-amplified events — the bench-scale
    form of events_range_join (identical join geometry, aggregated
    output). Paired with events_range_join_banded_amplified below; the two
    share one oracle because the results are identical."""
    return _range_join_summary(_range_join_plain(_amplified_events(spark, sf_dir)))


def events_range_join_banded_amplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join over the SAME x32-amplified events — measures the
    banded geometry against the plain form at a scale where join work
    dominates fixed overhead."""
    return _range_join_summary(_range_join_banded(_amplified_events(spark, sf_dir)))


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-fact join (deterministic salt from l_linenumber) —
    result-identical to the plain join, hot keys spread over 8 reducers."""
    from executor_u1mindexer_spark.operators import skew

    li = tables.load(spark, sf_dir, "lineitem")
    orders = tables.load(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    joined = skew.salted_join(
        li, orders, "l_orderkey", salt_source=F.col("l_linenumber")
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("sum_qty"),
    )


def topk_per_group_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant per-group top-k (r11, operators/skew.py
    salted_group_topk): top-5 customers by acctbal per nation via the
    two-phase salted rank — phase 1 caps every (group, salt) bucket at
    k, phase 2 ranks the <= k*n_salt survivors, provably equal to the
    plain per-group top-k (the oracle IS the plain form, so a lossy
    phase 1 diverges)."""
    from executor_u1mindexer_spark.operators import skew

    cust = tables.load(spark, sf_dir, "customer")
    out = skew.salted_group_topk(cust, "c_nationkey", "c_acctbal", "c_custkey", 5)
    return out.select(
        "c_nationkey", "c_custkey", "c_acctbal", "rank_in_group"
    ).orderBy("c_nationkey", "rank_in_group")


def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer max order price via a correlated scalar subquery —
    Catalyst decorrelates it into a left outer aggregate join."""
    tables.load(spark, sf_dir, "customer").createOrReplaceTempView("cust_cs")
    tables.load(spark, sf_dir, "orders").createOrReplaceTempView("orders_cs")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT max(o_totalprice) FROM orders_cs WHERE o_custkey = c_custkey)
                 AS max_order_price
        FROM cust_cs
        """
    )


def null_handling_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / nvl2 / null-safe equality over a derived nullable
    column (customers without orders yield NULL from the outer join)."""
    cust = tables.load(spark, sf_dir, "customer")
    orders = tables.load(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.max("o_totalprice").alias("max_price")
    )
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce("max_price", F.lit(0.0)).alias("price_or_zero"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("segment_nb"),
        F.when(F.col("max_price").isNull(), "never_ordered").otherwise("ordered").alias(
            "order_flag"
        ),
        F.col("max_price").eqNullSafe(F.lit(None).cast("double")).alias("is_null_safe"),
    )


def agg_stats_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median / exact percentile / stddev / variance per returnflag —
    rounded to 6dp: accumulation order differs across engines for the
    moment-based aggregates (Welford vs two-pass), so these are the one
    family where tolerance-by-rounding is semantically honest."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("median(l_quantity)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
        F.round(F.stddev("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
    )


def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join with the shuffle paid at WRITE time: both sides stored
    bucketed by orderkey, so the join itself is exchange-free (pinned in
    test_plans). The aggregate after it is the only shuffle in the plan."""
    from executor_u1mindexer_spark.operators import bucketing

    suffix = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    lt, rt = f"li_bkt_{suffix}", f"ord_bkt_{suffix}"
    bucketing.write_bucketed(
        tables.load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        ),
        lt,
        "l_orderkey",
    )
    bucketing.write_bucketed(
        tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus"),
        rt,
        "o_orderkey",
    )
    j = bucketing.bucketed_join(spark, lt, rt, "l_orderkey", "o_orderkey")
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double").alias("sum_price"),
    )


def join_full_outer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with both null sides guaranteed: the two aggregates
    cover explicitly different (overlapping) segment subsets, so each side
    contributes rows the other lacks."""
    left_segs = ["BUILDING", "FURNITURE", "MACHINERY"]
    right_segs = ["MACHINERY", "HOUSEHOLD", "AUTOMOBILE"]
    cust = (
        tables.load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .filter(F.col("c_mktsegment").isin(left_segs))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_rich"))
    )
    orders = (
        tables.load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .join(tables.load(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_mktsegment").isin(right_segs))
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("n_big_orders"))
    )
    j = cust.join(orders, cust.c_mktsegment == orders.seg, "full_outer")
    return j.select(
        F.coalesce("c_mktsegment", "seg").alias("segment"),
        F.coalesce("n_rich", F.lit(0)).alias("n_rich"),
        F.coalesce("n_big_orders", F.lit(0)).alias("n_big_orders"),
    )


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over day offsets: per customer, revenue in the 30 days up
    to each order (value-based frame, not row-based)."""
    orders = tables.load(spark, sf_dir, "orders").withColumn(
        "order_day", F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("order_day"))
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "order_day",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double").alias("rev_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


def window_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / first_value / last_value / nth_value over customers per
    segment by balance (full-partition frame for the value functions)."""
    cust = tables.load(spark, sf_dir, "customer")
    from pyspark.sql import Window

    order = [F.col("c_acctbal").desc(), F.col("c_custkey").asc()]
    w = Window.partitionBy("c_mktsegment").orderBy(*order)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.first("c_custkey").over(w_full).alias("richest_cust"),
        F.last("c_custkey").over(w_full).alias("poorest_cust"),
        F.nth_value("c_custkey", 2).over(w_full).alias("second_cust"),
    )


def window_cume_dist_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist / percent_rank over supplier balances per nation — the two
    distribution window functions not covered elsewhere."""
    from pyspark.sql import Window

    supp = tables.load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc()
    )
    return supp.select(
        "s_nationkey",
        "s_suppkey",
        F.round(F.cume_dist().over(w), 9).alias("bal_cume_dist"),
        F.round(F.percent_rank().over(w), 9).alias("bal_pct_rank"),
    )


def agg_listagg_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted string aggregation per group (LISTAGG): top-balance customer
    names per nation, sorted — collect_list is unordered by contract, so
    array_sort makes the result deterministic in both engines."""
    cust = tables.load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_rich"),
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("rich_names"),
    )


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group. Spark's `percentile` and
    DuckDB's `quantile_cont` both use the (n-1)*p linear-interpolation
    definition on sorted doubles — verified bit-identical. (The
    approx_percentile sketch is NOT oracle-able; exact percentile is the
    deterministic form, one sort per group inside the agg.)"""
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.25D)").alias("p25_price"),
            F.expr("percentile(l_extendedprice, 0.5D)").alias("p50_price"),
            F.expr("percentile(l_extendedprice, 0.75D)").alias("p75_price"),
            F.expr("percentile(l_quantity, 0.5D)").alias("p50_qty"),
        )
        .orderBy("l_returnflag")
    )


def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType surface: build a per-order quantity array (sort_array over
    collect_list — collect_list alone is partition-order nondeterministic;
    the sort makes the array canonical in both engines), then exercise
    size / distinct / min / max / slice / contains / fold. One shuffle (the
    groupBy); every array op is a codegen expression."""
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("int").alias("qty")
    )
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("qty")).alias("qties")
    )
    return g.select(
        "l_orderkey",
        F.size("qties").alias("n_items"),
        F.size(F.array_distinct("qties")).alias("n_distinct"),
        F.array_min("qties").alias("min_qty"),
        F.array_max("qties").alias("max_qty"),
        F.array_join(F.slice("qties", 1, 3), ",").alias("first3"),
        F.array_contains("qties", F.lit(25)).alias("has_25"),
        F.aggregate("qties", F.lit(0), lambda acc, x: acc + x).alias("sum_fold"),
    )


def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (t-digest-style sketch) checked as an invariant,
    the same scheme as agg_approx_distinct: the sketch's raw value is
    engine-specific, so the hashed output is the EXACT interpolated
    quantile plus a boolean asserting the approximation landed inside the
    exact [q-0.05, q+0.05] quantile band (accuracy=10000 guarantees rank
    error <= n/10000, far tighter). Oracle emits the exact values and TRUE.

    100 TB note: approx_percentile is the scale path — a mergeable sketch
    with map-side partials; exact percentile sorts per group inside the agg
    and is the small-data/verification path. Both take their percentages
    as ARRAYS (r09): one shared value buffer / one shared sketch per group
    instead of six exact buffers + two sketches — same interpolation, same
    values, 8x less per-group aggregate state (warm A/B at sf0.1:
    2.7 s -> 0.78 s)."""
    li = tables.load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile(l_extendedprice,"
            " array(0.45D, 0.5D, 0.55D, 0.85D, 0.9D, 0.95D))"
        ).alias("_p"),
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5D, 0.9D), 10000)"
        ).alias("_a"),
    )
    return agg.select(
        "l_returnflag",
        F.col("_p")[1].alias("p50_exact"),
        F.col("_p")[4].alias("p90_exact"),
        ((F.col("_a")[0] >= F.col("_p")[0]) & (F.col("_a")[0] <= F.col("_p")[2])).alias(
            "p50_within_band"
        ),
        ((F.col("_a")[1] >= F.col("_p")[3]) & (F.col("_a")[1] <= F.col("_p")[5])).alias(
            "p90_within_band"
        ),
    ).orderBy("l_returnflag")


def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot (melt) of the lineitem measure columns, then a
    per-metric profile — the schema-normalization op feature stores and
    metric pipelines lean on. DataFrame.unpivot stays a zero-shuffle
    projection (each input row emits k metric rows); only the profile
    aggregate shuffles, on a 3-value key."""
    li = tables.load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return (
        long.groupBy("metric")
        .agg(
            F.sum(F.col("val").cast("decimal(18,6)")).cast("double").alias("sum_val"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("metric")
    )


def fuzzy_join_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy self-join (entity-resolution shape): distinct
    part names paired when levenshtein ≤ 3, blocked on the first character
    so the join has an EQUI key (the block) and the distance is a residual
    — never an all-pairs cartesian. A ±2 length band prunes before the
    O(len²) distance. At 100 TB the block key would widen (first 2 chars +
    length bucket) but the shape is the same: equi-join on block, residual
    metric."""
    names = (
        tables.load(spark, sf_dir, "part").select("p_name").distinct()
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.substring("p_name", 1, 1).alias("blk"),
        F.length("p_name").alias("len_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.substring("p_name", 1, 1).alias("blk"),
        F.length("p_name").alias("len_b"),
    )
    pairs = (
        a.join(b, "blk")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= 2)
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 3)
    )
    return pairs.select("name_a", "name_b", "dist").orderBy("name_a", "name_b")


_VARIANT_QUERIES = {
    "fuzzy_join_part_names": fuzzy_join_part_names,
    "join_full_outer_segments": join_full_outer_segments,
    "agg_percentiles": agg_percentiles,
    "agg_approx_quantiles": agg_approx_quantiles,
    "scalar_array_funcs": scalar_array_funcs,
    "unpivot_lineitem_metrics": unpivot_lineitem_metrics,
    "agg_listagg_names": agg_listagg_names,
    "window_cume_dist_percent_rank": window_cume_dist_percent_rank,
    "window_range_frame": window_range_frame,
    "window_ntile_first_last": window_ntile_first_last,
    "bucketed_colocated_join": bucketed_colocated_join,
    "correlated_scalar_subquery": correlated_scalar_subquery,
    "null_handling_funcs": null_handling_funcs,
    "agg_stats_funcs": agg_stats_funcs,
    "skew_salted_join": skew_salted_join,
    "topk_per_group_salted": topk_per_group_salted,
    "scalar_math_funcs": scalar_math_funcs,
    "map_column_ops": map_column_ops,
    "grouping_sets_orders": grouping_sets_orders,
    "events_range_join": events_range_join,
    "events_range_join_amplified": events_range_join_amplified,
    "events_range_join_banded_amplified": events_range_join_banded_amplified,
    "events_range_join_bucketed": events_range_join_bucketed,
}

# shared by both amplified range-join forms — the results are identical by
# construction (only the join geometry differs), like the per-purchase pair
_RANGE_AMPLIFIED_SQL = f"""
WITH e AS (
  SELECT event_id, user_id + r * 1000000000 AS user_id, ts, event_type
  FROM events CROSS JOIN range({RANGE_AMPLIFY}) AS t(r)
), p AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM e WHERE event_type = 'purchase'
), v AS (
  SELECT user_id AS v_user, ts AS view_ts FROM e WHERE event_type = 'view'
), pv AS (
  SELECT purchase_id, user_id, count(view_ts) AS views_last_hour
  FROM p LEFT JOIN v
    ON user_id = v_user
   AND view_ts <= purchase_ts
   AND view_ts > purchase_ts - INTERVAL '1 hour'
  GROUP BY purchase_id, user_id
)
SELECT count(*) AS n_purchases,
       CAST(sum(views_last_hour) AS BIGINT) AS sum_views,
       count(DISTINCT user_id) AS n_users
FROM pv
"""

_VARIANT_ORACLES = {
    "fuzzy_join_part_names": """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
FROM names a JOIN names b
  ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
 AND a.p_name < b.p_name
 AND abs(length(a.p_name) - length(b.p_name)) <= 2
WHERE levenshtein(a.p_name, b.p_name) <= 3
ORDER BY name_a, name_b
""",
    "scalar_array_funcs": """
WITH g AS (
  SELECT l_orderkey, list_sort(list(CAST(l_quantity AS INT))) AS qties
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(qties) AS INT) AS n_items,
       CAST(len(list_distinct(qties)) AS INT) AS n_distinct,
       list_min(qties) AS min_qty,
       list_max(qties) AS max_qty,
       array_to_string(qties[1:3], ',') AS first3,
       list_contains(qties, 25) AS has_25,
       CAST(list_reduce(list_prepend(0, qties), (acc, x) -> acc + x) AS INT) AS sum_fold
FROM g
""",
    "agg_approx_quantiles": """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50_exact,
       quantile_cont(l_extendedprice, 0.9) AS p90_exact,
       TRUE AS p50_within_band,
       TRUE AS p90_within_band
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    "agg_percentiles": """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.25) AS p25_price,
       quantile_cont(l_extendedprice, 0.5)  AS p50_price,
       quantile_cont(l_extendedprice, 0.75) AS p75_price,
       quantile_cont(l_quantity, 0.5)       AS p50_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    "unpivot_lineitem_metrics": """
WITH long AS (
  SELECT 'l_discount' AS metric, l_discount AS val FROM lineitem
  UNION ALL SELECT 'l_quantity', l_quantity FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
SELECT metric,
       CAST(sum(CAST(val AS DECIMAL(18,6))) AS DOUBLE) AS sum_val,
       min(val) AS min_val, max(val) AS max_val, count(*) AS n
FROM long GROUP BY metric ORDER BY metric
""",
    "window_cume_dist_percent_rank": """
SELECT s_nationkey, s_suppkey,
       round(cume_dist() OVER w, 9) AS bal_cume_dist,
       round(percent_rank() OVER w, 9) AS bal_pct_rank
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal ASC, s_suppkey ASC)
""",
    "agg_listagg_names": """
SELECT c_nationkey, count(*) AS n_rich,
       string_agg(c_name, ',' ORDER BY c_name) AS rich_names
FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
""",
    "join_full_outer_segments": """
WITH cust AS (
  SELECT c_mktsegment, count(*) AS n_rich FROM customer
  WHERE c_acctbal > 9000
    AND c_mktsegment IN ('BUILDING', 'FURNITURE', 'MACHINERY')
  GROUP BY c_mktsegment
), ords AS (
  SELECT c_mktsegment AS seg, count(*) AS n_big_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_totalprice > 450000
    AND c_mktsegment IN ('MACHINERY', 'HOUSEHOLD', 'AUTOMOBILE')
  GROUP BY c_mktsegment
)
SELECT coalesce(c_mktsegment, seg) AS segment,
       coalesce(n_rich, 0) AS n_rich,
       coalesce(n_big_orders, 0) AS n_big_orders
FROM cust FULL OUTER JOIN ords ON c_mktsegment = seg
""",
    "window_range_frame": """
WITH o AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS order_day
  FROM orders
)
SELECT o_custkey, o_orderkey, order_day,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
         OVER (PARTITION BY o_custkey ORDER BY order_day
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_30d,
       count(*) OVER (PARTITION BY o_custkey ORDER BY order_day
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_orders_30d
FROM o
""",
    "window_ntile_first_last": """
SELECT c_mktsegment, c_custkey,
       ntile(4) OVER w AS balance_quartile,
       first_value(c_custkey) OVER wf AS richest_cust,
       last_value(c_custkey) OVER wf AS poorest_cust,
       nth_value(c_custkey, 2) OVER wf AS second_cust
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC),
       wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    "bucketed_colocated_join": """
SELECT o_orderstatus, count(*) AS n_lines,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
    "correlated_scalar_subquery": """
SELECT c_custkey, c_name,
       (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey)
         AS max_order_price
FROM customer
""",
    "null_handling_funcs": """
WITH agg AS (
  SELECT o_custkey, max(o_totalprice) AS max_price FROM orders GROUP BY o_custkey
)
SELECT c_custkey,
       coalesce(max_price, 0.0) AS price_or_zero,
       nullif(c_mktsegment, 'BUILDING') AS segment_nb,
       CASE WHEN max_price IS NULL THEN 'never_ordered' ELSE 'ordered' END AS order_flag,
       max_price IS NOT DISTINCT FROM NULL AS is_null_safe
FROM customer LEFT JOIN agg ON c_custkey = o_custkey
""",
    "agg_stats_funcs": """
SELECT l_returnflag,
       round(median(l_quantity), 6) AS median_qty,
       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(var_samp(l_quantity), 6) AS var_qty,
       round(avg(l_quantity), 6) AS avg_qty
FROM lineitem GROUP BY l_returnflag
""",
    # plain one-window formulation on purpose: the salted two-phase must
    # produce EXACTLY the per-group top-k, so the oracle is the direct form
    "topk_per_group_salted": """
SELECT c_nationkey, c_custkey, c_acctbal,
       CAST(rnk AS INT) AS rank_in_group
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
  FROM customer
) t WHERE rnk <= 5
ORDER BY c_nationkey, rank_in_group
""",
    "skew_salted_join": """
SELECT o_orderstatus, count(*) AS n_lines,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
    "scalar_math_funcs": """
SELECT p_partkey,
       abs(p_retailprice - 1000.0) AS abs_centered,
       sqrt(p_retailprice) AS sqrt_price,
       p_retailprice * p_retailprice AS price_sq,
       round(ln(p_retailprice), 9) AS ln_price,
       round(p_retailprice / 7.0, 3) AS seventh_rounded,
       CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sign_centered,
       greatest(p_retailprice, 500.0) AS floor_500,
       least(p_retailprice, 1500.0) AS cap_1500
FROM part
""",
    "map_column_ops": """
SELECT event_id,
       event_type AS attr_type,
       CAST(user_id AS VARCHAR) AS attr_user,
       2 AS n_attrs,
       'type,user' AS key_list
FROM events
""",
    "grouping_sets_orders": """
SELECT o_orderstatus, o_orderpriority,
       CASE WHEN grouping(o_orderstatus) THEN 1 ELSE 0 END AS g_status,
       CASE WHEN grouping(o_orderpriority) THEN 1 ELSE 0 END AS g_priority,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    "events_range_join": """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id AS v_user, ts AS view_ts FROM events WHERE event_type = 'view'
)
SELECT purchase_id, user_id, purchase_ts, count(view_ts) AS views_last_hour
FROM p LEFT JOIN v
  ON user_id = v_user
 AND view_ts <= purchase_ts
 AND view_ts > purchase_ts - INTERVAL '1 hour'
GROUP BY purchase_id, user_id, purchase_ts
""",
    "events_range_join_bucketed": """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id AS v_user, ts AS view_ts FROM events WHERE event_type = 'view'
)
SELECT purchase_id, user_id, purchase_ts, count(view_ts) AS views_last_hour
FROM p LEFT JOIN v
  ON user_id = v_user
 AND view_ts <= purchase_ts
 AND view_ts > purchase_ts - INTERVAL '1 hour'
GROUP BY purchase_id, user_id, purchase_ts
""",
    "events_range_join_amplified": _RANGE_AMPLIFIED_SQL,
    "events_range_join_banded_amplified": _RANGE_AMPLIFIED_SQL,
}


# -- registry folding (VERDICT r09 #3) ----------------------------------------
# Four cross-module family twins: the window/scalar/grouping/approx-agg
# showcases (12 near-duplicate rows across relational_suite and this
# module) fold into one registered row each under the canonical melted
# schema of suites/_fold.py. Raw passthrough columns that only re-read the
# scan (window_running_sum's o_orderdate) are not re-compared; every
# OPERATOR output column is. Dates melt via CAST(x AS DATE) -> string,
# which prints identically in both engines.

from executor_u1mindexer_spark.suites import _fold as FD
from executor_u1mindexer_spark.suites import relational_suite as _RS

FOLDED_HERE = (
    "window_cume_dist_percent_rank",
    "window_range_frame",
    "window_ntile_first_last",
    "scalar_math_funcs",
    "scalar_array_funcs",
    "grouping_sets_orders",
    "agg_percentiles",
    "agg_approx_quantiles",
)

_ALL_Q = {**_RS._VARIANT_QUERIES, **_VARIANT_QUERIES}
_ALL_O = {**_RS._VARIANT_ORACLES, **_VARIANT_ORACLES}

FAMILIES = {
    "window_funcs": [
        ("window_running_sum", ["o_custkey", "o_orderkey"],
         ["running_total", "order_seq"], {}),
        ("window_rank_lag_lead", ["c_nationkey", "c_custkey"],
         ["c_acctbal", "bal_rank", "bal_dense_rank", "prev_cust", "next_cust"], {}),
        ("window_range_frame", ["o_custkey", "o_orderkey"],
         ["order_day", "rev_30d", "n_orders_30d"], {}),
        ("window_ntile_first_last", ["c_mktsegment", "c_custkey"],
         ["balance_quartile", "richest_cust", "poorest_cust", "second_cust"], {}),
        ("window_cume_dist_percent_rank", ["s_nationkey", "s_suppkey"],
         ["bal_cume_dist", "bal_pct_rank"], {}),
    ],
    "scalar_funcs": [
        ("scalar_string_funcs", ["p_partkey"],
         ["name_lower", "brand_upper", "name_len", "name_head",
          "type_devowel", "brand_type", "first_word"],
         {"strings": {"name_lower", "brand_upper", "name_head",
                      "type_devowel", "brand_type", "first_word"}}),
        ("scalar_date_funcs", ["o_orderkey"],
         ["order_year", "order_month", "order_day", "order_quarter",
          "month_start", "days_to_2002"],
         {"dates": {"month_start"}}),
        ("scalar_math_funcs", ["p_partkey"],
         ["abs_centered", "sqrt_price", "price_sq", "ln_price",
          "seventh_rounded", "sign_centered", "floor_500", "cap_1500"], {}),
        ("scalar_array_funcs", ["l_orderkey"],
         ["n_items", "n_distinct", "min_qty", "max_qty", "first3",
          "has_25", "sum_fold"],
         {"strings": {"first3"}, "bools": {"has_25"}}),
    ],
    "grouping_analytics": [
        ("rollup_returnflag_linestatus", ["l_returnflag", "l_linestatus"],
         ["n", "sum_qty"], {}),
        ("cube_orderstatus_priority", ["o_orderstatus", "o_orderpriority"],
         ["n", "sum_price"], {}),
        ("grouping_sets_orders", ["o_orderstatus", "o_orderpriority"],
         ["g_status", "g_priority", "n", "sum_price"], {}),
    ],
    "agg_approx_family": [
        ("agg_approx_distinct", [],
         ["exact_parts", "approx_within_10pct"],
         {"bools": {"approx_within_10pct"}}),
        ("agg_percentiles", ["l_returnflag"],
         ["p25_price", "p50_price", "p75_price", "p50_qty"], {}),
        ("agg_approx_quantiles", ["l_returnflag"],
         ["p50_exact", "p90_exact", "p50_within_band", "p90_within_band"],
         {"bools": {"p50_within_band", "p90_within_band"}}),
    ],
}

QUERIES = {k: v for k, v in _VARIANT_QUERIES.items() if k not in FOLDED_HERE}
ORACLES = {k: v for k, v in _VARIANT_ORACLES.items() if k not in FOLDED_HERE}
for _fam, _members in FAMILIES.items():
    QUERIES[_fam], ORACLES[_fam] = FD.fold_family(_fam, _members, _ALL_Q, _ALL_O)


FP_MINSUP = 3


def basket_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori frequent item pairs (r12, operators/pipeline.frequent_pairs
    — Agrawal & Srikant VLDB'94) over order baskets: part pairs co-listed
    in >= 3 orders, with support and cross-engine-exact lift. The
    downward-closure prune (broadcast frequent-1 semi-join) runs before
    any pair is generated; pair fan-out is bounded per basket, never an
    item-domain cross join. Oracle replays prune/pair/lift identically."""
    li = tables.load(spark, sf_dir, "lineitem")
    return PIPE.frequent_pairs(
        li, basket_col="l_orderkey", item_col="l_partkey", minsup=FP_MINSUP
    )


QUERIES["basket_frequent_pairs"] = basket_frequent_pairs
ORACLES["basket_frequent_pairs"] = PIPE.oracle_frequent_pairs_sql(
    "lineitem", "l_orderkey", "l_partkey", FP_MINSUP
)
