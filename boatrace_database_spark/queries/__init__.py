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
# lever. Catalog after round 10: 149 queries, 137 oracle-backed.
#
# Round-10 rotation. State after r9: nothing is red (49 green + 1
# rows-only of the 50 checked; union across rounds 134 oracle-PASS +
# 11 rows-only). Tiering:
#   tier 1 = the round-10 NEW/CHANGED entries: media_decode_jpeg (new
#            native baseline+progressive JPEG codec + oracle),
#            media_gif_animation (new native GIF codec + animation
#            pipeline + oracle), semantic_dedup_assign
#            (derived n_assign + per-cell Gram scoring default),
#            ann_ivf_topk / ann_ivfpq_topk / ivf_cell_stats
#            (size-derived quantizer dials — identical results at
#            sf0.01 by construction, but the driver must re-witness),
#            rotation_invariant_topk (4-dp witness rounding), and
#            media_decode_png (chunk-walk bounds hardening);
#   tier 2 = the ~10-row r6-green tail the r9 budget cut (4 rounds
#            stale — the frontier the r9 verdict's item #4 leads with);
#   tier 3 = the r7-green rows (3 rounds stale);
#   tier 4 = the r8-refreshed rows;
#   tier 5 = the r9-refreshed rows (freshest).
# tier 1 (10) + tier 2 (10) + tier 3 (46) = 64 exceeds the ~50-row
# budget; the ~14-row tail of tier 3 tops next round's frontier.
_ORDER = [
    # ---- tier 1: round-10 new/changed ----
    "media_decode_jpeg", "media_gif_animation", "media_decode_tiff",
    "media_audio_dedup",
    "semantic_dedup_assign", "ann_ivf_topk",
    "ann_ivfpq_topk", "ivf_cell_stats", "rotation_invariant_topk",
    "media_decode_png",
    # ---- tier 2: the r6-green tail (4 rounds stale) ----
    "chunk_dedup_pipeline", "sketch_distinct_users", "token_budget_head",
    "dsir_select_corpus", "quality_topk_per_source", "dedup_fuzzy_edit",
    "dedup_incremental_batch", "scd2_user_state", "bm25_topk_docs",
    "repeated_substring_spans",
    # ---- tier 3: the r7-green rows (3 rounds stale) ----
    "funnel_conversion", "funnel_windowed", "cohort_retention",
    "event_transitions", "attribution_last_touch", "pmi_collocations",
    "sample_group_reservoir", "sample_group_weighted",
    "tfidf_related_docs", "tfidf_top_terms_per_doc",
    "retrieval_rrf_fusion", "retrieval_hard_negatives", "bm25_index_stats",
    "sketch_freq_sources", "sketch_price_quantiles",
    "strip_repeated_spans", "dedup_incremental_bloom",
    "dedup_best_quality", "dedup_minhash_incremental", "bpe_token_count",
    "compression_quality", "quality_quantile_gate", "lm_quality_score",
    "width_normalize_battery", "split_exact_assign",
    "split_stratified_assign", "token_budget_mixture",
    "decontaminate_drop_train", "time_hopping", "time_session",
    "career_class_transitions", "racer_podium_funnel",
    "racer_first_win_cohort", "packed_split_pipeline",
    "mixture_temperature_resample", "dedup_exact", "dedup_ngram_jaccard",
    "text_profile", "embedding_cosine_topk", "embedding_norm_stats",
    "multimodal_features", "asof_join_events", "flag_timing_features",
    "sessionize_gaps", "salted_skew_agg", "date_battery",
    # ---- tier 4: the r8-refreshed rows ----
    "pack_materialize", "embedding_project_jl", "media_decode_roundtrip",
    "decontaminate_semantic_flags", "null_battery", "union_distinct",
    "window_value_funcs", "udtf_tokenize", "corpus_clean_pipeline",
    "token_count_battery", "dedup_cluster_assign", "q1_pricing_summary",
    "q3_shipping_priority", "q5_region_revenue", "join_single_key",
    "prefix_filter", "prefix_filter_disjunction", "decontaminate_eval",
    "repetition_profile", "pii_redact_scrub", "mixture_resample_recipe",
    "pack_sequences_windows", "training_data_pipeline", "split_train_eval",
    "global_shuffle_order", "chunk_documents_windows", "ngram_topk",
    "append_union", "sentinel_fill", "regex_gate", "regex_extract",
    "concat_key", "dedup_minhash_lsh", "dedup_simhash",
    "approx_distinct_quantile", "freq_items_heavy_hitters",
    # ---- tier 5: the r9-refreshed rows (freshest) ----
    "media_dedup_dhash", "media_frame_sample", "ann_lsh_topk",
    "text_rolling_hash", "retrieval_mmr_diversified",
    "dedup_embedding_cosine", "retrieval_eval_metrics", "running_counter",
    "last_value_propagation", "stanza_lookahead", "date_range_explode",
    "full_select", "agg_features", "feature_assembly", "roi_simulation",
    "accuracy_metrics", "topk_orders", "window_rank_per_group",
    "window_lag_lead", "rollup_agg", "cube_agg", "grouping_sets",
    "distinct_pairs", "count_distinct_agg", "semi_join", "anti_join",
    "join_composite_key", "outer_join", "range_join", "intersect_setop",
    "except_setop", "scalar_battery", "json_extract", "pivot_wide",
    "unpivot_stack", "sample_systematic", "percentile_quantile",
    "time_tumble", "correlated_scalar_subquery", "having_filter",
    "min_max_by", "string_agg_sorted", "window_range_frame",
    "moving_avg_rows", "ntile_cume", "ann_bucket_stats",
    "table_audit_orders",
]


if set(_ORDER) != set(_ALL_QUERIES):
    raise RuntimeError(
        "query catalog / _ORDER mismatch: "
        f"{sorted(set(_ORDER) ^ set(_ALL_QUERIES))}"
    )
QUERIES = {name: _ALL_QUERIES[name] for name in _ORDER}
ORACLES = {name: _ALL_ORACLES[name] for name in _ORDER if name in _ALL_ORACLES}
