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

from boatrace_database_spark.queries import advanced, analytics, llm, relational

_ALL_QUERIES = {}
_ALL_ORACLES = {}
for mod in (relational, analytics, advanced, llm):
    _ALL_QUERIES.update(mod.QUERIES)
    _ALL_ORACLES.update({k: v for k, v in mod.ORACLES.items() if v is not None})

# Evaluation order. The driver walks queries() in dict order under a
# bounded budget (each round records rows for the first ~50 of the
# catalog — 88 after round 5 added the ANN tuning dials, ngram_topk,
# the decontamination / repetition / PII-redaction / mixture /
# packing pipeline ops, and the split / global-shuffle / semantic-dedup
# / chunking ops), so
# ordering is the coverage lever. Round-5 rotation (r4 verified the
# then-tiers 1-4 — 44 green + 6 rows-only, zero failures; union r3∪r4
# covered all 74 pre-existing):
# tier 1 = the 24 queries whose NEWEST driver row is r3 (they sat in
# r4's tier 5) — the staleness frontier the r4 verdict told r5 to
# clear, tier 2 = queries whose CODE CHANGED in round 5 (multi-table
# LSH ANN rework, deterministic IVF build, cosine_pairs_lsh id-type
# fix, minhash max_df guards) — changed code must re-verify, tier 3 =
# the remaining no-oracle operators (cheap rows-only records), tier 4
# = 19 of the queries green r1+r2+r4 (second-newest row r2 — the
# oldest double-verification), tier 5 = the rest of that group plus
# everything green r3+r4 — the most recently double-verified set costs
# least if the budget truncates. Tiers 1-4 total 61 (24+17+4+16: the
# ten new pipeline ops joined tier 2, freq_items joined tier 3), so a
# 50-row budget truncates tier 4's last ~11 — all green in r4, keeping
# every catalog query green within r4∪r5.
_ORDER = [
    # tier 1 — newest driver row is r3 (r4's tier 5)
    "dedup_exact", "dedup_ngram_jaccard", "text_profile",
    "embedding_cosine_topk",
    "embedding_norm_stats", "multimodal_features", "asof_join_events",
    "flag_timing_features", "sessionize_gaps", "salted_skew_agg",
    "date_battery", "null_battery", "union_distinct",
    "window_value_funcs", "udtf_tokenize", "corpus_clean_pipeline",
    "token_count_battery", "dedup_cluster_assign",
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "join_single_key", "prefix_filter", "prefix_filter_disjunction",
    # tier 2 — code changed/added in round 5: must (re-)verify
    "decontaminate_eval", "repetition_profile", "pii_redact_scrub",
    "mixture_resample_recipe", "pack_sequences_windows",
    "training_data_pipeline",
    "split_train_eval", "global_shuffle_order", "semantic_dedup_assign",
    "chunk_documents_windows",
    "ann_lsh_topk", "ann_ivf_topk", "ann_bucket_stats", "ivf_cell_stats",
    "ngram_topk", "dedup_embedding_cosine", "dedup_minhash_lsh",
    # tier 3 — remaining no-oracle (rows-only) operators
    "dedup_simhash", "text_rolling_hash", "approx_distinct_quantile",
    "freq_items_heavy_hitters",
    # tier 4 — green r1+r2+r4: second-newest row is r2, the oldest
    # double-verification among the r4-green set
    "append_union", "sentinel_fill",
    "regex_gate", "regex_extract", "concat_key", "running_counter",
    "last_value_propagation", "stanza_lookahead", "date_range_explode",
    "full_select", "agg_features", "feature_assembly", "roi_simulation",
    "accuracy_metrics", "topk_orders", "window_rank_per_group",
    # tier 5 — most recently double-verified (r3+r4 or r2+r4)
    "window_lag_lead", "rollup_agg", "cube_agg",
    "grouping_sets", "distinct_pairs", "count_distinct_agg",
    "semi_join", "anti_join", "join_composite_key",
    "outer_join", "range_join", "intersect_setop", "except_setop",
    "scalar_battery", "json_extract", "pivot_wide", "unpivot_stack",
    "sample_systematic", "percentile_quantile", "time_tumble",
    "correlated_scalar_subquery", "having_filter", "min_max_by",
    "string_agg_sorted", "window_range_frame", "moving_avg_rows",
    "ntile_cume",
]

if set(_ORDER) != set(_ALL_QUERIES):
    raise RuntimeError(
        "query catalog / _ORDER mismatch: "
        f"{sorted(set(_ORDER) ^ set(_ALL_QUERIES))}"
    )
QUERIES = {name: _ALL_QUERIES[name] for name in _ORDER}
ORACLES = {name: _ALL_ORACLES[name] for name in _ORDER if name in _ALL_ORACLES}
