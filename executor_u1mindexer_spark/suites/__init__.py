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

# Rows whose implementation/oracle changed THIS round (rotation policy
# (a)); rotation_check treats these as legitimate window occupants even
# while stale rows wait. Keep this list honest — it is the audit trail
# for why a fresh row occupies a slot ahead of a stale one.
POLICY_A = ()

DRIVER_PRIORITY = (
    # Round 11 window (VERDICT r10 #1, rotated as the FIRST commit of the
    # round per the settled protocol): the 9 never-driver-checked r10 rows
    # lead, then ALL 22 surviving r06-stale rows, then the 17 oldest
    # (alphabetical) of the 43 r08-stale rows, then the rows ADDED in
    # r11 (never-checked rows outrank merely-r08-stale ones — the
    # no-wasted-slots rule fires if they wait outside). Staleness floor
    # rises to r08 after this round; the remaining r08 rows queue for
    # r12 (listed after the boundary), keeping the 4-window cycle.
    # never driver-checked (new in r10; the r11 rows sit at the end of
    # the window):
    "multimodal_container_properties",
    "mixture_temperature_resample",
    "layout_hilbert_clustering",
    "near_dedup_containment_prefix",
    "sample_domain_quota",
    "ivm_incremental_agg",
    "dq_constraint_audit",
    "source_schema_evolution",
    "events_interval_union",
    # ALL 22 surviving r06-stale rows (alphabetical):
    "agg_listagg_names",
    "ann_partitioned_topk",
    "ann_range_search",
    "decontaminated_training_mix",
    "delete_by_ids",
    "dump_load_roundtrip",
    "embedding_centroids_by_label",
    "embedding_matryoshka_stats",
    "eval_retrieval_label_metrics",
    "events_funnel_view_click_purchase",
    "events_gapfill_hourly",
    "events_range_join_amplified",
    "events_range_join_banded_amplified",
    "events_resample_ohlc",
    "graph_pagerank_parts",
    "graph_triangle_count",
    "multimodal_decode_gif_animation",
    "sketch_bloom_join_prune",
    "sketch_quantile_clip_outliers",
    "text_bm25_topk_joins",
    "text_bpe_learn_merges",
    "text_bpe_tokenize",
    # 12 oldest r08-stale rows (alphabetical prefix of the 43; the last
    # seven slots go to the r11 never-checked rows below):
    "ann_hnsw_partitioned_topk",
    "drift_chi2_value_periods",
    "embedding_gram_moments",
    "events_markov_transitions",
    "events_range_join_bucketed",
    "events_retention_cohorts",
    "events_rolling_zscore",
    "graph_cc_event_chains",
    "graph_label_propagation",
    "index_upsert",
    "layout_file_skipping",
    "layout_zorder_clustering",
    "events_interval_gaps",
    "dq_backlog_cross_batch",
    "ivm_retractable_delta",
    "near_dedup_edit_distance",
    "events_asof_nearest_view",
    "topk_per_group_salted",
    "events_sessionize_capped",
    # --- 50-slot window boundary ---
    # r12 window plan: rows added in r11 after this point lead (never
    # driver-checked; each green at 3 SFs in this round's sweeps), then
    # the 27 remaining r08-stale rows, then the oldest r09 rows. Every
    # NEW registry row displaces the bottom r08 row from the window —
    # the no-wasted-slots rule requires never-checked rows inside.
    "llm_corpus_pipeline",
    "multimodal_decode_audio",
    "multimodal_decode_webp_lossless",
    "multimodal_sample_video_frames",
    "multimodal_thumbnail_meta",
    "near_dedup_cc_clusters",
    "near_dedup_clusters",
    "near_dedup_simhash",
    "pack_token_budget",
    "shuffle_epoch_order",
    "simhash_fingerprints",
    "source_compact_small_files",
    "source_partitioned_parquet",
    "split_train_val_test",
    "status_counts",
    "text_char_ngram_stats",
    "text_corpus_stats",
    "text_inverted_index",
    "text_length_histogram",
    "text_phrase_search",
    "text_pii_redaction",
    "text_repetition_scores",
    "text_url_domains",
    "tpch_q10_returned_items",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q6_forecast_revenue",
    "unpivot_lineitem_metrics",
    "update_existing",
    "update_skipped",
    "vector_dedup_quantize",
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
