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
# bounded budget (rounds 1 and 2 each recorded rows for exactly the
# first 50 of 74), so ordering is the coverage lever. Round-3 rotation:
# tier 1 = the 18 oracle-backed queries whose only green driver row is
# CORRECTNESS_r01 (they had no r2 row), tier 2 = the 19 whose only
# green row is CORRECTNESS_r02, tier 3 = the 6 no-oracle hash-based
# operators (5 have never had a driver row; approx_distinct_quantile
# had only an r1 rows-only record), tier 4 = the 31 queries already
# green in BOTH r1 and r2 — the double-verified set costs the least if
# the budget truncates the tail. Tiers 1-3 total 43, so the whole
# never-twice-verified set fits inside a 50-row budget.
_ORDER = [
    # tier 1 — green in r1 only (no CORRECTNESS_r02 row)
    "outer_join", "range_join", "intersect_setop", "except_setop",
    "scalar_battery", "json_extract", "pivot_wide", "unpivot_stack",
    "sample_systematic", "percentile_quantile", "time_tumble",
    "correlated_scalar_subquery", "having_filter", "min_max_by",
    "string_agg_sorted", "window_range_frame", "moving_avg_rows",
    "ntile_cume",
    # tier 2 — green in r2 only (no CORRECTNESS_r01 row)
    "dedup_exact", "dedup_ngram_jaccard", "text_profile",
    "embedding_cosine_topk", "dedup_embedding_cosine",
    "embedding_norm_stats", "multimodal_features", "asof_join_events",
    "flag_timing_features", "sessionize_gaps", "salted_skew_agg",
    "date_battery", "null_battery", "union_distinct",
    "window_value_funcs", "udtf_tokenize", "corpus_clean_pipeline",
    "token_count_battery", "dedup_cluster_assign",
    # tier 3 — no-oracle (rows-only) hash-based operators
    "approx_distinct_quantile", "text_rolling_hash", "dedup_minhash_lsh",
    "dedup_simhash", "ann_lsh_topk", "ann_ivf_topk",
    # tier 4 — green in BOTH r1 and r2
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "join_single_key", "join_composite_key", "prefix_filter",
    "prefix_filter_disjunction", "append_union", "sentinel_fill",
    "regex_gate", "regex_extract", "concat_key", "running_counter",
    "last_value_propagation", "stanza_lookahead", "date_range_explode",
    "full_select", "agg_features", "feature_assembly", "roi_simulation",
    "accuracy_metrics", "topk_orders", "window_rank_per_group",
    "window_lag_lead", "rollup_agg", "cube_agg", "grouping_sets",
    "distinct_pairs", "count_distinct_agg", "semi_join", "anti_join",
]

if set(_ORDER) != set(_ALL_QUERIES):
    raise RuntimeError(
        "query catalog / _ORDER mismatch: "
        f"{sorted(set(_ORDER) ^ set(_ALL_QUERIES))}"
    )
QUERIES = {name: _ALL_QUERIES[name] for name in _ORDER}
ORACLES = {name: _ALL_ORACLES[name] for name in _ORDER if name in _ALL_ORACLES}
