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
# bounded budget (each round records rows for the first ~50 of 74), so
# ordering is the coverage lever. Round-4 rotation (r3 spent its budget
# on the 43 never-twice-verified queries — all green):
# tier 1 = the 24 queries whose r3 run fell outside the budget (their
# only green rows are r1+r2), tier 2 = queries whose CODE CHANGED this
# round (join_composite_key threshold, ann_ivf_topk build/probe split)
# plus the r3 perf-weak dedup_embedding_cosine — changed code must
# re-verify, tier 3 = the remaining no-oracle hash operators (cheap
# rows-only records), tier 4 = queries green in r1+r3 (their non-r3 row
# is the oldest), tier 5 = green in r2+r3 and the r3-verified head of
# the old tier-4 — the most recently double-verified set costs least if
# the budget truncates. Tiers 1-4 total exactly 50.
_ORDER = [
    # tier 1 — no r3 row (green r1+r2 only)
    "append_union", "sentinel_fill",
    "regex_gate", "regex_extract", "concat_key", "running_counter",
    "last_value_propagation", "stanza_lookahead", "date_range_explode",
    "full_select", "agg_features", "feature_assembly", "roi_simulation",
    "accuracy_metrics", "topk_orders", "window_rank_per_group",
    "window_lag_lead", "rollup_agg", "cube_agg", "grouping_sets",
    "distinct_pairs", "count_distinct_agg", "semi_join", "anti_join",
    # tier 2 — changed in round 4 / r3 perf-weak: must re-verify
    "join_composite_key", "ann_ivf_topk", "dedup_embedding_cosine",
    # tier 3 — no-oracle (rows-only) hash-based operators
    "approx_distinct_quantile", "text_rolling_hash", "dedup_minhash_lsh",
    "dedup_simhash", "ann_lsh_topk",
    # tier 4 — green r1+r3; the non-r3 row is the staleness frontier
    "outer_join", "range_join", "intersect_setop", "except_setop",
    "scalar_battery", "json_extract", "pivot_wide", "unpivot_stack",
    "sample_systematic", "percentile_quantile", "time_tumble",
    "correlated_scalar_subquery", "having_filter", "min_max_by",
    "string_agg_sorted", "window_range_frame", "moving_avg_rows",
    "ntile_cume",
    # tier 5 — green r2+r3 / r1+r2+r3
    "dedup_exact", "dedup_ngram_jaccard", "text_profile",
    "embedding_cosine_topk",
    "embedding_norm_stats", "multimodal_features", "asof_join_events",
    "flag_timing_features", "sessionize_gaps", "salted_skew_agg",
    "date_battery", "null_battery", "union_distinct",
    "window_value_funcs", "udtf_tokenize", "corpus_clean_pipeline",
    "token_count_battery", "dedup_cluster_assign",
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "join_single_key", "prefix_filter", "prefix_filter_disjunction",
]

if set(_ORDER) != set(_ALL_QUERIES):
    raise RuntimeError(
        "query catalog / _ORDER mismatch: "
        f"{sorted(set(_ORDER) ^ set(_ALL_QUERIES))}"
    )
QUERIES = {name: _ALL_QUERIES[name] for name in _ORDER}
ORACLES = {name: _ALL_ORACLES[name] for name in _ORDER if name in _ALL_ORACLES}
