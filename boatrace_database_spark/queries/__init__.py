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
# lever. Catalog after round 13: 153 queries, 140 oracle-backed.
#
# Round-13 rotation. State after r12: nothing is red (46 oracle-green
# + 4 rows-only of the 50 checked; union across rounds 140 oracle-PASS
# + 12 rows-only = 152/152). Tiering:
#   tier 1 = round-13 NEW/CHANGED entries, all of which MUST re-check:
#            ann_ivfpq_refined (NEW — r12 verdict item #5, the refine
#            operating point the target_recall contract routes to),
#            ann_lsh_topk (size-derived plane geometry, verdict item
#            #1 — the floor regime reproduces the shipped oracle's
#            plan byte-identically at driver scale), and dedup_simhash
#            (the measured-occupancy skew loop, verdict item #2;
#            rows-only by nature — identical at sf0.01 where the
#            uniform plan measures clean, escalates at sf1);
#   tier 2 = the 10-row r9-stale tier-4 frontier (verdict item #3 —
#            the documented least-loss rotation overflow, now the
#            stalest rows in the catalog at 4 rounds);
#   tier 3 = the r10-green rows (3 rounds stale), as many as fit the
#            ~50 budget — expected cut line lands inside this block;
#   tier 4 = the r11-green rows (2 rounds stale);
#   tier 5 = the r12-green rows (freshest — checked last round).
_ORDER = [
    # ---- tier 1: round-13 new/changed ----
    "ann_ivfpq_refined", "ann_lsh_topk", "dedup_simhash",
    # ---- tier 2: the r9-stale frontier (r12 verdict item #3) ----
    "ntile_cume", "window_lag_lead",
    "intersect_setop", "except_setop", "cube_agg", "sample_systematic",
    "scalar_battery", "topk_orders", "distinct_pairs", "having_filter",
    # ---- tier 3: the r10-green rows (3 rounds stale) ----
    "ann_ivf_topk", "ann_ivfpq_topk", "attribution_last_touch",
    "bm25_index_stats", "bm25_topk_docs", "bpe_token_count",
    "chunk_dedup_pipeline", "cohort_retention", "compression_quality",
    "decontaminate_drop_train", "dedup_best_quality", "dedup_fuzzy_edit",
    "dedup_incremental_batch", "dedup_incremental_bloom",
    "dedup_minhash_incremental", "dsir_select_corpus", "event_transitions",
    "funnel_conversion", "funnel_windowed", "ivf_cell_stats",
    "lm_quality_score", "media_decode_png", "media_gif_animation",
    "pmi_collocations", "quality_quantile_gate", "quality_topk_per_source",
    "repeated_substring_spans", "retrieval_hard_negatives",
    "retrieval_rrf_fusion", "rotation_invariant_topk",
    "sample_group_reservoir", "sample_group_weighted", "scd2_user_state",
    "semantic_dedup_assign", "sketch_distinct_users",
    "sketch_freq_sources", "sketch_price_quantiles", "split_exact_assign",
    "split_stratified_assign", "strip_repeated_spans",
    "tfidf_related_docs", "tfidf_top_terms_per_doc", "time_hopping",
    "time_session", "token_budget_head", "token_budget_mixture",
    "width_normalize_battery",
    # ---- tier 4: the r11-green rows (2 rounds stale) ----
    "audio_features", "media_decode_cmyk", "media_audio_dedup",
    "media_frame_sample", "media_decode_jpeg", "media_decode_tiff",
    "asof_join_events", "career_class_transitions", "date_battery",
    "dedup_exact", "dedup_ngram_jaccard", "embedding_cosine_topk",
    "embedding_norm_stats", "flag_timing_features",
    "mixture_temperature_resample", "multimodal_features",
    "packed_split_pipeline", "racer_first_win_cohort",
    "racer_podium_funnel", "sessionize_gaps",
    "text_profile",
    "regex_gate", "regex_extract", "concat_key", "sentinel_fill",
    "prefix_filter", "prefix_filter_disjunction", "udtf_tokenize",
    "chunk_documents_windows", "corpus_clean_pipeline",
    "decontaminate_eval", "decontaminate_semantic_flags",
    "dedup_cluster_assign", "mixture_resample_recipe", "ngram_topk",
    "null_battery", "pack_materialize", "pack_sequences_windows",
    "pii_redact_scrub", "repetition_profile", "split_train_eval",
    "token_count_battery", "training_data_pipeline", "union_distinct",
    # ---- tier 5: the r12-green rows (freshest) ----
    "ivf_index_maintenance",
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "rollup_agg", "roi_simulation", "join_single_key", "append_union",
    "correlated_scalar_subquery", "agg_features", "feature_assembly",
    "media_dedup_dhash",
    "moving_avg_rows", "salted_skew_agg", "unpivot_stack",
    "window_value_funcs", "dedup_minhash_lsh", "approx_distinct_quantile",
    "freq_items_heavy_hitters", "media_decode_roundtrip",
    "embedding_project_jl", "global_shuffle_order",
    "accuracy_metrics", "ann_bucket_stats", "anti_join",
    "count_distinct_agg", "date_range_explode", "dedup_embedding_cosine",
    "full_select", "grouping_sets",
    "join_composite_key", "json_extract", "last_value_propagation",
    "min_max_by", "outer_join", "percentile_quantile", "pivot_wide",
    "range_join", "retrieval_eval_metrics", "retrieval_mmr_diversified",
    "running_counter", "semi_join", "stanza_lookahead",
    "string_agg_sorted", "table_audit_orders", "text_rolling_hash",
    "time_tumble", "window_range_frame", "window_rank_per_group",
]


if set(_ORDER) != set(_ALL_QUERIES):
    raise RuntimeError(
        "query catalog / _ORDER mismatch: "
        f"{sorted(set(_ORDER) ^ set(_ALL_QUERIES))}"
    )
QUERIES = {name: _ALL_QUERIES[name] for name in _ORDER}
ORACLES = {name: _ALL_ORACLES[name] for name in _ORDER if name in _ALL_ORACLES}
