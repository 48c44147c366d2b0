"""Query catalog: every SURVEY §2 operator demonstrated on the driver's
star schema, each with a DuckDB oracle SQL (where SQL-expressible).

Registry contract (driver __spark_entry__.py):
- ``QUERIES[name]``   : (spark, sf_dir) -> DataFrame
- ``ORACLES[name]``   : ANSI SQL string DuckDB runs on the same tables,
                        or absent for non-SQL-expressible operators
                        (the driver then records a rows-only check).

Column names are aliased identically on both sides; float aggregates
are rounded identically on both sides so order-of-summation noise
cannot flip the driver's value hash.
"""

from __future__ import annotations

from boatrace_database_spark.queries import (
    advanced,
    analytics,
    domain,
    llm,
    relational,
)

_ALL_QUERIES = {}
_ALL_ORACLES = {}
for mod in (relational, analytics, advanced, llm, domain):
    _ALL_QUERIES.update(mod.QUERIES)
    _ALL_ORACLES.update({k: v for k, v in mod.ORACLES.items() if v is not None})

# Evaluation order. The driver walks queries() in dict order under a
# bounded budget (~50 rows per round), so ordering is the coverage
# lever. Catalog after round 7: 138 queries, 124 oracle-backed.
#
# Round-7 rotation. State after r6: the r6 driver verified 50 rows
# (all green), r5 verified 50 (all green after the r6 CAST re-verify),
# and 34 catalog queries have NEVER held a driver row (the r6 verdict's
# "What's missing #1" — budget math, not failures; all 29
# oracle-backed ones are green in the local typed parity gate at
# sf0.01 plus the sf0.1/sf0.001 sweep, re-run this round at 123/123 —
# BENCHNOTES §35).  Tiering:
#   tier 1 = the 34 never-driver-checked queries — the entire backlog
#            fits one round's budget, so after r7 every catalog query
#            holds a driver row;
#   tier 2 = queries NEW in round 7 (boatrace-domain behavioral
#            compositions, packed-corpus stratified-split pipeline);
#   tier 3 = staleness frontier: queries whose newest driver row is r5
#            (r6's tiers 3-5) — fills the budget remainder so the
#            oldest rows refresh first;
#   tier 4 = the 50 r6-green rows (freshest, re-verified last round).
_ORDER = [
    # ---- tier 1: the 34 never-driver-checked (clears the backlog) ----
    # behavioral family (session 6): first driver rows
    "funnel_conversion", "funnel_windowed", "cohort_retention",
    "event_transitions", "attribution_last_touch", "pmi_collocations",
    # per-group sampling pair (session 5)
    "sample_group_reservoir", "sample_group_weighted",
    # retrieval family tails (tf-idf pair, fusion, mining, dial, MMR)
    "tfidf_related_docs", "tfidf_top_terms_per_doc",
    "retrieval_rrf_fusion", "retrieval_hard_negatives",
    "bm25_index_stats",
    # retrieval_mmr_diversified: rows-only BY NATURE (greedy MMR is
    # iterative, not SQL); objective arithmetic pytest-pinned
    "retrieval_mmr_diversified",
    # sketch family's CMS + histogram faces
    "sketch_freq_sources", "sketch_price_quantiles",
    # text/dedup tails
    "strip_repeated_spans", "dedup_incremental_bloom",
    "dedup_best_quality",
    # dedup_minhash_incremental / bpe_token_count /
    # compression_quality: rows-only (no oracle by nature)
    "dedup_minhash_incremental", "bpe_token_count",
    "compression_quality",
    # quality tails
    "quality_quantile_gate", "lm_quality_score",
    "width_normalize_battery",
    # corpus-assembly tails (splits, budgets, packing, decontam, JL)
    "split_exact_assign", "split_stratified_assign",
    "token_budget_mixture", "pack_materialize",
    "decontaminate_drop_train", "embedding_project_jl",
    # windowing variants
    "time_hopping", "time_session",
    # ann_ivfpq_topk: rows-only (pytest lossless/recall contracts)
    "ann_ivfpq_topk",
    # ---- tier 2: NEW in round 7 ----
    "career_class_transitions", "racer_podium_funnel",
    "racer_first_win_cohort", "packed_split_pipeline",
    "mixture_temperature_resample",
    # ---- tier 3: staleness frontier (newest row r5) ----
    "dedup_exact", "dedup_ngram_jaccard", "text_profile",
    "embedding_cosine_topk", "embedding_norm_stats",
    "multimodal_features", "asof_join_events", "flag_timing_features",
    "sessionize_gaps",
    "salted_skew_agg", "date_battery", "null_battery", "union_distinct",
    "window_value_funcs", "udtf_tokenize", "corpus_clean_pipeline",
    "token_count_battery", "dedup_cluster_assign",
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "join_single_key", "prefix_filter", "prefix_filter_disjunction",
    "decontaminate_eval", "repetition_profile", "pii_redact_scrub",
    "mixture_resample_recipe", "pack_sequences_windows",
    "training_data_pipeline", "split_train_eval",
    "global_shuffle_order", "chunk_documents_windows", "ngram_topk",
    "dedup_embedding_cosine", "append_union", "sentinel_fill",
    "regex_gate", "regex_extract", "concat_key",
    # r5 rows-only ops (weakest driver record, cheapest to defer
    # inside the tier)
    "semantic_dedup_assign", "ann_lsh_topk", "ann_ivf_topk",
    "ivf_cell_stats", "dedup_minhash_lsh", "dedup_simhash",
    "text_rolling_hash", "approx_distinct_quantile",
    "freq_items_heavy_hitters",
    # ---- tier 4: the 50 r6-green rows (freshest) ----
    "running_counter", "last_value_propagation", "stanza_lookahead",
    "date_range_explode", "full_select", "agg_features",
    "feature_assembly", "roi_simulation", "accuracy_metrics",
    "topk_orders", "window_rank_per_group", "window_lag_lead",
    "rollup_agg", "cube_agg", "grouping_sets", "distinct_pairs",
    "count_distinct_agg", "semi_join", "anti_join",
    "join_composite_key", "outer_join", "range_join",
    "intersect_setop", "except_setop", "scalar_battery",
    "json_extract", "pivot_wide", "unpivot_stack",
    "sample_systematic", "percentile_quantile", "time_tumble",
    "correlated_scalar_subquery", "having_filter", "min_max_by",
    "string_agg_sorted", "window_range_frame", "moving_avg_rows",
    "ntile_cume",
    "ann_bucket_stats", "table_audit_orders", "chunk_dedup_pipeline",
    "sketch_distinct_users", "token_budget_head", "dsir_select_corpus",
    "quality_topk_per_source", "dedup_fuzzy_edit",
    "dedup_incremental_batch", "scd2_user_state", "bm25_topk_docs",
    "repeated_substring_spans",
]

if set(_ORDER) != set(_ALL_QUERIES):
    raise RuntimeError(
        "query catalog / _ORDER mismatch: "
        f"{sorted(set(_ORDER) ^ set(_ALL_QUERIES))}"
    )
QUERIES = {name: _ALL_QUERIES[name] for name in _ORDER}
ORACLES = {name: _ALL_ORACLES[name] for name in _ORDER if name in _ALL_ORACLES}
