"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark 4's `hll_sketch_agg` family): the incremental-analytics pattern
where per-partition (per-day, per-source) sketches are PERSISTED and
any cross-partition distinct count is a union over the tiny sketch
table — never a rescan of the corpus.

This is the cardinality face of the repo's incremental family
(`incremental_exact_dedup` keeps exact keys, `bloom` keeps membership,
this keeps distinct COUNTS): a 100 TB warehouse answers "distinct
users this quarter" from 90 sketch rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch per group: (group_cols..., sketch BINARY,
    n_rows). The persistable state — write it partitioned by the
    group (e.g. day); each new partition APPENDS one row. ``lgk``
    sizes the sketch (2^lgk registers; relative error ≈ 1.04/√2^lgk —
    ~1.6% at the default 12, 4 KB per sketch). Sketch construction is
    a partial aggregate: map-side sketches merge in the shuffle, so
    the full key set never concentrates anywhere.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def union_distinct_estimate(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Distinct-count estimates from a sketch table: union the
    sketches (all of them, or per ``group_cols`` rollup) and
    estimate. The input is sketch-table-sized — one tiny row per
    original group — so ANY rollup over ANY time range is a
    seconds-scale query regardless of corpus size; sketch union is
    commutative and lossless w.r.t. the sketch state, so merging
    per-day sketches equals sketching the union of the days
    (contract-tested).
    """
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "distinct_estimate"
        ),
        F.sum("n_rows").alias("n_rows"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*agg)
    return sketches.agg(*agg)
