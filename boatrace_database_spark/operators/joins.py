"""Join operators Spark lacks natively: as-of join (plus the range-join
pattern shown in queries/analytics.py).

As-of join, Spark-first: instead of per-group pandas merge_asof (Python
in the hot path, whole group in memory), union the two sides into one
ordered stream and propagate the right side's latest values with a
last(ignorenulls) window. One shuffle on (key), sorted within
partitions — scales to arbitrarily many rows per key and stays in
Tungsten. Reference point for semantics: pandas merge_asof /
QuestDB-style ASOF JOIN (left row matches the most recent right row
with right.ts <= left.ts, per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: values from the latest right row with
    right_ts <= left_ts, per `on` key. NULL when no prior right row.

    Implementation: tag sides, union, window-sort by (ts, side) with
    right rows sorting BEFORE left rows at equal ts (<= semantics),
    then last(ignorenulls) over the ordered stream; keep left rows.

    Ties among RIGHT rows at identical (key, ts) are resolved
    arbitrarily (no further sort key) — same as DuckDB/pandas asof.
    Callers needing a deterministic result on tie-bearing data should
    pre-collapse the right side to one row per (key, ts) (see
    queries/llm.attribution_last_touch).
    """
    l = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        *[F.col(c) for c in value_cols],
    ).withColumn("_side", F.lit(0))

    lcols = set(left.columns)
    r_renamed = r
    for c in value_cols:
        r_renamed = r_renamed.withColumnRenamed(c, c + suffix)
    out_vals = [c + suffix for c in value_cols]

    merged = l.unionByName(r_renamed, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in out_vals:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return merged.where(F.col("_side") == 1).drop("_side", "_ts")
