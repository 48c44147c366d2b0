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
# lever. Catalog after round 11: 151 queries, 139 oracle-backed.
#
# Round-11 rotation. State after r10: nothing is red (42 oracle-green
# + 8 rows-only of the 50 checked; union across rounds 137 oracle-PASS
# + 12 rows-only = 149/149). Tiering:
#   tier 1 = the round-11 NEW/CHANGED entries: audio_features (NEW —
#            oracle-backed promotion of the late-r10 audio
#            descriptors, verdict item #1), media_decode_cmyk (NEW —
#            Adobe 4-component decode under the oracle gate, verdict
#            item #5), media_audio_dedup (the
#            streaming twin's batch face; H-K band-edge fix),
#            media_frame_sample (multi-page-TIFF branch landed after
#            the r10 driver run; GIF >256-color composite fallback),
#            media_decode_jpeg (0xFF fill-byte marker-walk fix),
#            media_decode_tiff (IFD cycle guard);
#   tier 2 = the r7-green rows (4 rounds stale — the frontier);
#   tier 3 = the r8-green rows (3 rounds stale), the nine SURVEY-§2
#            reference-parity entries first (verdict item #2);
#   tier 3 tail = 8-row least-loss overflow past the ~50 budget
#            (window_value_funcs joins it for the media_decode_cmyk
#            slot — the window family keeps 5 fresher r9/r10 rows):
#            dedup_minhash_lsh / dedup_simhash (rows-only by nature —
#            a re-check re-witnesses determinism, not values),
#            approx_distinct_quantile / freq_items_heavy_hitters
#            (sketch family re-witnessed this round via the three r7
#            sketch_* rows), media_decode_roundtrip (media family has
#            5 fresher faces in tier 1), embedding_project_jl
#            (embedding family covered by tier 2's cosine/norm rows),
#            global_shuffle_order (corpus family covered by tier 2's
#            packed_split_pipeline). These 7 top the r12 frontier.
#   tier 4 = the r9-refreshed rows; tier 5 = the r10 rows (freshest).
_ORDER = [
    # ---- tier 1: round-11 new/changed ----
    "audio_features", "media_decode_cmyk", "media_audio_dedup",
    "media_frame_sample", "media_decode_jpeg", "media_decode_tiff",
    # ---- tier 2: the r7-green rows (4 rounds stale) ----
    "asof_join_events", "career_class_transitions", "date_battery",
    "dedup_exact", "dedup_ngram_jaccard", "embedding_cosine_topk",
    "embedding_norm_stats", "flag_timing_features",
    "mixture_temperature_resample", "multimodal_features",
    "packed_split_pipeline", "racer_first_win_cohort",
    "racer_podium_funnel", "salted_skew_agg", "sessionize_gaps",
    "text_profile",
    # ---- tier 3: the r8-green rows (3 rounds stale; parity block first) ----
    "regex_gate", "regex_extract", "concat_key", "sentinel_fill",
    "append_union", "join_single_key", "prefix_filter",
    "prefix_filter_disjunction", "udtf_tokenize",
    "chunk_documents_windows", "corpus_clean_pipeline",
    "decontaminate_eval", "decontaminate_semantic_flags",
    "dedup_cluster_assign", "mixture_resample_recipe", "ngram_topk",
    "null_battery", "pack_materialize", "pack_sequences_windows",
    "pii_redact_scrub", "q1_pricing_summary", "q3_shipping_priority",
    "q5_region_revenue", "repetition_profile", "split_train_eval",
    "token_count_battery", "training_data_pipeline", "union_distinct",
    # ---- tier 3 tail: the 8-row least-loss overflow (see note) ----
    "window_value_funcs",
    "dedup_minhash_lsh", "dedup_simhash", "approx_distinct_quantile",
    "freq_items_heavy_hitters", "media_decode_roundtrip",
    "embedding_project_jl", "global_shuffle_order",
    # ---- tier 4: the r9-refreshed rows ----
    "accuracy_metrics", "agg_features", "ann_bucket_stats", "ann_lsh_topk",
    "anti_join", "correlated_scalar_subquery", "count_distinct_agg",
    "cube_agg", "date_range_explode", "dedup_embedding_cosine",
    "distinct_pairs", "except_setop", "feature_assembly", "full_select",
    "grouping_sets", "having_filter", "intersect_setop",
    "join_composite_key", "json_extract", "last_value_propagation",
    "media_dedup_dhash", "min_max_by", "moving_avg_rows", "ntile_cume",
    "outer_join", "percentile_quantile", "pivot_wide", "range_join",
    "retrieval_eval_metrics", "retrieval_mmr_diversified",
    "roi_simulation", "rollup_agg", "running_counter", "sample_systematic",
    "scalar_battery", "semi_join", "stanza_lookahead", "string_agg_sorted",
    "table_audit_orders", "text_rolling_hash", "time_tumble",
    "topk_orders", "unpivot_stack", "window_lag_lead",
    "window_range_frame", "window_rank_per_group",
    # ---- tier 5: the r10-refreshed rows (freshest) ----
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
]


if set(_ORDER) != set(_ALL_QUERIES):
    raise RuntimeError(
        "query catalog / _ORDER mismatch: "
        f"{sorted(set(_ORDER) ^ set(_ALL_QUERIES))}"
    )
QUERIES = {name: _ALL_QUERIES[name] for name in _ORDER}
ORACLES = {name: _ALL_ORACLES[name] for name in _ORDER if name in _ALL_ORACLES}
