"""Query suites — the driver-facing registry.

Each suite module exposes:
  QUERIES: dict[name, Callable[[SparkSession, sf_dir], DataFrame]]
  ORACLES: dict[name, str]   # DuckDB ANSI SQL over the fixture views

`__spark_entry__.py` aggregates every suite. Names are the operator names
from SURVEY.md §2. A query without an oracle entry gets the driver's weaker
rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


SUITE_MODULES = (
    "vector_suite",
    "maintenance_suite",
    "relational_suite",
    "relational_extra_suite",
    "tpch_suite",
    "events_suite",
    "dedup_suite",
    "text_suite",
    "multimodal_suite",
    "similarity_suite",
    "sources_suite",
    "pipeline_suite",
    "composed_suite",
    "sketch_suite",
    "graph_suite",
)

# The grading driver checks only the FIRST 50 registry entries, so ordering
# decides which SAMPLE of the registry gets a driver correctness row this
# round. The driver window is a sample, NOT the verification gate: the gate
# is `tools/oracle_check.py` (dtype-faithful since r03), which runs ALL
# registry queries against their DuckDB oracles locally every round and
# whose result is committed as CORRECTNESS_LOCAL_r{N}.json. Rotation policy:
# (a) queries whose implementation or oracle changed this round come first,
# (b) then queries with the OLDEST driver row (re-earn a row over time),
# (c) everything else keeps its newest green row and cycles next round.
#
# Round 10 (VERDICT r09 #1/#3/#4): the registry folded 193 -> 161 rows
# (suites/_fold.py; sketch 23->7, knn batch 4->1, window 5->1, scalar
# 4->1, grouping 3->1, sources-roundtrip 3->1, agg-approx 3->1, rrf
# batch folded into hybrid_search_rrf), which removed 34 of the 93
# driver-stale rows outright. The window below = 1 changed row
# (hybrid_search_rrf: schema changed by the fold, impl changed by the
# triangular-rank rebuild) + the 12 never-driver-checked rows (the 11
# fold names + index_upsert_capacity, which carries the AMS/CMS/Bloom
# fresh-row mandate of r09 #4 inside sketch_ams/sketch_cms/sketch_bloom)
# + ALL 37 surviving r05-stale rows (events_sessionize first,
# verdict-named). The remaining stale debt (r06 block) fully fits the
# r11 window: 161 rows / 50 slots cycles in 4 windows with ~stale-free
# steady state at threshold cur-2 once this round's debt drains.
# tools/rotation_check.py enforces "no wasted slots": every window slot
# must hold a stale, never-checked, or POLICY_A row while debt exists.

# ROTATION CADENCE POLICY for a 200+-row registry (VERDICT r12 #3, cycle
# bound amended r14 per VERDICT r13 #4 with the arithmetic written down;
# tools/rotation_check.py encodes the enforceable parts):
#   * Cycle arithmetic (the reason the bound is cur-5, not cur-4): at
#     209 registry rows a 50-slot window needs 209/50 = 4.18 rounds of
#     pure re-earning — already past an exact 4-round fit — and in
#     practice each window spends ~2-12 slots on POLICY_A, flagship-
#     guard, directive, and never-checked rows (r13 spent 16, r14
#     spends 8), so the effective stale-re-earn rate is ~40-48
#     slots/round and a full cycle is ceil(209/~44) = 5 rounds. Growth
#     of ~2-7 rows/round stays inside that bound up to ~240 rows
#     (240/48 = 5.0); past that, fold sibling rows (suites/_fold.py)
#     before stretching the bound again. Steady state: the staleness
#     histogram must never show a checked bucket older than cur-5 —
#     rotation_check enforces this like the flagship guard (assuming
#     the committed window earns at cur+1, no row outside the window
#     may be older than (cur+1)-5).
#   * Slot priority, top to bottom:
#       1. POLICY_A rows (implementation/oracle changed this round) — a
#          changed row's old stamp proves nothing about the new code;
#       2. flagship-tier rows the guard forces in (a §2.A flagship row
#          may never exceed 2 rounds driver-stale);
#       3. never-driver-checked rows (new rows jump the queue — a row
#          with NO stamp outranks one with merely an old stamp);
#       4. oldest-basis stale rows, alphabetical within a round-bucket.
#   * Rows added AFTER the round's window is frozen queue for the next
#     window (the late-r12 precedent) — they do NOT evict an already-
#     rotated stale row mid-round unless a directive demands a driver
#     stamp this round (then they displace the BOTTOM stale slot, which
#     heads the next queue).
#   * If registry growth pushes the cycle past 5 rounds (~240 rows at
#     the measured re-earn rate — see the arithmetic above), fold
#     sibling rows into parameterized twins (suites/_fold.py machinery)
#     rather than stretching the bound again — silent cycle stretch is
#     the r08 failure mode, and rotation_check's MAX_AGE tripwire makes
#     it loud.
#   * The boundary comment below the 50th slot always carries the next
#     window's queue so the rotation commit is a copy-paste.

# Rows whose implementation/oracle changed THIS round (rotation policy
# (a)); rotation_check treats these as legitimate window occupants even
# while stale rows wait. Keep this list honest — it is the audit trail
# for why a fresh row occupies a slot ahead of a stale one.
# r15: the three ADVICE r14 drift/eval rows — eval_ann_recall_by_group
# (left-join + coalesce so zero-hit slices surface as recall 0 instead
# of dropping), events_ks_value_drift (overflow-safe verdict lane +
# empty-input row contract), events_mwu_value_drift (zero-variance
# guard + empty-input row contract). All three are ALSO never-driver-
# checked (added r14 after that window froze), so their slots are
# legitimate twice over.
POLICY_A = (
    "eval_ann_recall_by_group",
    "events_ks_value_drift",
    "events_mwu_value_drift",
)

DRIVER_PRIORITY = (
    # Round 15 window (VERDICT r14 #1, rotated as the FIRST commit of
    # the round, following the FIRING GUARDS rather than the stale r14
    # boundary comment — rotation_check at the r14 at-rest tree fires
    # FLAGSHIP TIER VIOLATION for the 8 §2.A rows below, and the 11
    # r10-stale rows sit at the MAX_AGE=5 bound, so the slot arithmetic
    # that closes this round is exactly: 8 flagship + 4 never-checked
    # r14 rows + 11 r10 rows + 27 oldest-alphabetical r11 rows = 50.
    # The 21 remaining r11 rows head the r16 queue below.
    # §2.A flagship tier (last stamped r12 — the 2-round bound is red):
    "knn_search_cosine",
    "knn_search_euclidean",
    "knn_search_inner_product",
    "payload_fetch",
    "limit_clamp",
    "score_transform_similarity",
    "dim_validate",
    "clear",
    # never driver-checked (added r14 after that window froze; each
    # green at sf0.01+sf0.1 in the committed r14 sweeps and all four
    # ★-re-oracled by the judge; the three POLICY_A rows carry this
    # round's ADVICE r14 fixes):
    "events_ks_value_drift",
    "events_mwu_value_drift",
    "eval_ann_recall_by_group",
    "eval_retrieval_ndcg",
    # r10-stale (the full remaining 11-row bucket — at the MAX_AGE=5
    # cadence bound; leaving any of these out trips the tripwire at
    # r16):
    "text_fingerprints",
    "text_language_id",
    "text_quality_scores",
    "text_token_counts",
    "text_vocab_topk",
    "topk_orders_by_price",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "traverse_chunks",
    "window_funcs",
    # r11-stale rows, alphabetical (first 27 of the 48-row bucket):
    "agg_listagg_names",
    "ann_hnsw_partitioned_topk",
    "ann_partitioned_topk",
    "ann_range_search",
    "decontaminated_training_mix",
    "delete_by_ids",
    "dq_backlog_cross_batch",
    "dq_constraint_audit",
    "drift_chi2_value_periods",
    "dump_load_roundtrip",
    "embedding_centroids_by_label",
    "embedding_gram_moments",
    "embedding_matryoshka_stats",
    "eval_retrieval_label_metrics",
    "events_funnel_view_click_purchase",
    "events_gapfill_hourly",
    "events_interval_gaps",
    "events_interval_union",
    "events_markov_transitions",
    "events_range_join_amplified",
    "events_range_join_banded_amplified",
    "events_range_join_bucketed",
    "events_resample_ohlc",
    "events_retention_cohorts",
    "events_rolling_zscore",
    "events_sessionize_capped",
    "graph_cc_event_chains",
    # --- 50-slot window boundary ---
    # r16 window plan — run rotation_check with CORRECTNESS_r15.json
    # present and follow the GUARDS (the r14/r15 lesson), but the
    # arithmetic is already written here so the guard holds no
    # surprise: the flagship guard WILL fire for `knn_search_batch`
    # (last stamped r13, deliberately not in this window because it was
    # inside the 2-round bound at r15 — at r16 it is not), so the r16
    # window = knn_search_batch + the 2 never-checked r15 growth rows
    # (events_ks_value_drift_by_type — the grouped-KS slice audit,
    # VERDICT r14 #4b — and exact_dedup_substring_spans — the Lee et
    # al. duplicated-span lane, VERDICT r14 #4a; never-checked rows
    # jump the queue per the cadence policy) + the 21 remaining
    # r11-stale rows below (after them the r11 bucket is EMPTY) + the
    # oldest 26 alphabetical r12 rows = exactly 50.
    # Registry-growth margin (VERDICT r14 #5): at 215 rows (213 + the
    # two r15 growth rows) the written cur-5 arithmetic holds to ~240
    # rows at the measured ~44-slot re-earn rate, leaving ~25 rows of
    # margin — no fold needed yet, watch again at r16.
    # r16 growth candidate, already built + pytest-pinned but
    # deliberately unregistered (the <=2-rows cadence cap was spent):
    # quantile.mann_whitney_u_by_group / oracle_mann_whitney_u_by_group
    # _sql — register as `events_mwu_value_drift_by_type` beside the
    # grouped KS row; 3-SF oracle checks still due at registration.
    # r11-stale, did not fit this window (21):
    "graph_label_propagation",
    "graph_pagerank_parts",
    "graph_triangle_count",
    "index_upsert",
    "ivm_incremental_agg",
    "layout_file_skipping",
    "layout_hilbert_clustering",
    "layout_zorder_clustering",
    "mixture_temperature_resample",
    "multimodal_container_properties",
    "multimodal_decode_gif_animation",
    "near_dedup_containment_prefix",
    "near_dedup_edit_distance",
    "sample_domain_quota",
    "sketch_bloom_join_prune",
    "sketch_quantile_clip_outliers",
    "source_schema_evolution",
    "text_bm25_topk_joins",
    "text_bpe_learn_merges",
    "text_bpe_tokenize",
    "topk_per_group_salted",
)


def merged() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    suites = []
    for mod_name in SUITE_MODULES:
        try:
            suites.append(
                importlib.import_module(f"executor_u1mindexer_spark.suites.{mod_name}")
            )
        except ModuleNotFoundError as e:
            # Only tolerate the suite module itself not existing yet;
            # a broken import inside a suite must fail loudly.
            if e.name != f"executor_u1mindexer_spark.suites.{mod_name}":
                raise
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for s in suites:
        for k in s.QUERIES:
            if k in queries:
                raise ValueError(f"duplicate query name {k!r}")
        queries.update(s.QUERIES)
        oracles.update(s.ORACLES)
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    missing = [n for n in DRIVER_PRIORITY if n not in queries]
    if missing:
        raise ValueError(f"DRIVER_PRIORITY names without queries: {missing}")
    ordered = list(DRIVER_PRIORITY) + [n for n in queries if n not in set(DRIVER_PRIORITY)]
    queries = {n: queries[n] for n in ordered}
    oracles = {n: oracles[n] for n in ordered if n in oracles}
    return queries, oracles
