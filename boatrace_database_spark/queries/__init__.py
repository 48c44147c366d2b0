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
# bounded budget (round 1 recorded rows for exactly the first 50), so:
# tier 1 = the core SURVEY §2 reference-surface rows, tier 2 = the
# LLM-pipeline + advanced operators that lacked rows in round 1, tier 3
# = the remaining relational demos, tier 4 = rows-only (no-oracle)
# hash-based operators last — their driver check is weakest, so they
# cost the least if a budget truncates the tail.
_ORDER = [
    # tier 1 — reference-surface core (SURVEY §2 P/A rows)
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "join_single_key", "join_composite_key", "prefix_filter",
    "prefix_filter_disjunction", "append_union", "sentinel_fill",
    "regex_gate", "regex_extract", "concat_key", "running_counter",
    "last_value_propagation", "stanza_lookahead", "date_range_explode",
    "full_select", "agg_features", "feature_assembly", "roi_simulation",
    "accuracy_metrics", "topk_orders", "window_rank_per_group",
    "window_lag_lead", "rollup_agg",
    # tier 2 — oracle-backed queries without a CORRECTNESS_r01 row
    "dedup_exact", "dedup_ngram_jaccard", "text_profile",
    "embedding_cosine_topk", "dedup_embedding_cosine",
    "embedding_norm_stats", "multimodal_features", "asof_join_events", "flag_timing_features",
    "sessionize_gaps", "salted_skew_agg", "date_battery", "null_battery",
    "union_distinct", "window_value_funcs", "udtf_tokenize", "corpus_clean_pipeline", "token_count_battery", "dedup_cluster_assign",
    # tier 3 — remaining oracle-backed relational/analytic demos
    "cube_agg", "grouping_sets", "distinct_pairs", "count_distinct_agg",
    "semi_join", "anti_join", "outer_join", "range_join",
    "intersect_setop", "except_setop", "scalar_battery", "json_extract",
    "pivot_wide", "unpivot_stack", "sample_systematic",
    "percentile_quantile", "time_tumble", "correlated_scalar_subquery",
    "having_filter", "min_max_by", "string_agg_sorted",
    "window_range_frame", "moving_avg_rows", "ntile_cume",
    # tier 4 — no-oracle (rows-only) hash-based operators
    "approx_distinct_quantile", "text_rolling_hash", "dedup_minhash_lsh",
    "dedup_simhash", "ann_lsh_topk", "ann_ivf_topk",
]

assert set(_ORDER) == set(_ALL_QUERIES), (
    sorted(set(_ORDER) ^ set(_ALL_QUERIES))
)
QUERIES = {name: _ALL_QUERIES[name] for name in _ORDER}
ORACLES = {name: _ALL_ORACLES[name] for name in _ORDER if name in _ALL_ORACLES}
