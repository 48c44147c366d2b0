"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark 4's `hll_sketch_agg` family): the incremental-analytics pattern
where per-partition (per-day, per-source) sketches are PERSISTED and
any cross-partition distinct count is a union over the tiny sketch
table — never a rescan of the corpus.

This is the cardinality face of the repo's incremental family
(`incremental_exact_dedup` keeps exact keys, `bloom` keeps membership,
this keeps distinct COUNTS): a 100 TB warehouse answers "distinct
users this quarter" from 90 sketch rows.

The Count-Min section below adds the FREQUENCY face: approximate
per-key counts from the same persist-and-merge pattern, in an
engine-portable long format (every cell auditable by the DuckDB
oracle).
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


# ----------------------------------------------------------------------
# Count-Min sketches: the FREQUENCY face of the incremental-sketch
# family (HLL above keeps distinct counts, operators/bloom.py keeps
# membership, this keeps approximate per-key counts). Long-format
# representation — one (group..., d, w, cnt) row per touched cell — so
# a persisted per-day sketch table MERGES with a plain groupBy-sum
# (elementwise counter add, the CMS merge operation), and the whole
# pipeline is deterministic md5-prefix arithmetic reproducible by the
# DuckDB oracle (unlike the HLL binary blobs).


def _cms_bucket(col, salt: str, width: int):
    """Engine-portable CMS row hash: int(first 8 md5 hex chars of
    (salt || key)) mod width — the same md5-prefix idiom as
    selection.hashed_gram_buckets; salt = '<d>:' gives depth
    independent rows."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 8), 16, 10)
        .cast("bigint")
        % width
    )


def cms_sketches(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """One Count-Min sketch per group as long-format cell rows
    (group_cols..., d, w, cnt, width, depth) — at most depth*width rows
    per group regardless of key cardinality. NULL keys are dropped
    (a NULL has no frequency identity).

    Error contract (Cormode-Muthukrishnan): estimates never
    UNDERcount; overcount <= e/width * N with probability
    1 - e^-depth per query. Construction is one explode(depth) +
    groupBy — map-side partial sums merge in the shuffle, so the
    sketch of 100 TB is built in one pass and lands as <= depth*width
    rows. width/depth ride along as columns so a reader can't probe a
    sketch with the wrong geometry (cms_estimate validates).
    """
    group_cols = group_cols or []
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), _cms_bucket(key, f"{d}:", width).alias("w")
            )
            for d in range(depth)
        ]
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(*group_cols, F.explode(cells).alias("c"))
        .groupBy(*group_cols, F.col("c.d").alias("d"), F.col("c.w").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("width", F.lit(width))
        .withColumn("depth", F.lit(depth))
    )


def cms_merge(sketches: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge CMS cell rows (e.g. a union of per-day sketch tables, or
    a rollup that drops some group columns): elementwise counter add =
    groupBy-sum over the tiny cell table. Merging per-day sketches
    EQUALS sketching the unioned days (contract-tested) — the property
    that makes the persisted table incrementally appendable."""
    group_cols = group_cols or []
    return (
        sketches.groupBy(*group_cols, "d", "w", "width", "depth")
        .agg(F.sum("cnt").alias("cnt"))
        .select(*group_cols, "d", "w", "cnt", "width", "depth")
    )


def cms_estimate(
    sketches: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Point-frequency estimates for a key table against a CMS:
    est(key) = min over d of cnt[d, h_d(key)], absent cells = 0.
    Geometry (width, depth) is read FROM the sketch rows and validated
    unique — probing with mismatched hashes cannot happen silently.

    The sketch side is <= depth*width rows per group — broadcast into
    the key probe, so estimating any number of keys is one narrow
    pass + a per-key min."""
    group_cols = group_cols or []
    geom = sketches.select("width", "depth").distinct().collect()
    if not geom:
        raise ValueError("cms_estimate: sketch table is empty")
    if len(geom) != 1:
        raise ValueError(
            f"cms_estimate: sketch table mixes geometries {geom} — merge "
            "only sketches built with identical (width, depth)"
        )
    width, depth = geom[0].width, geom[0].depth
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), _cms_bucket(key, f"{d}:", width).alias("w")
            )
            for d in range(depth)
        ]
    )
    probes = (
        keys.where(F.col(key_col).isNotNull())
        .select(*group_cols, F.col(key_col), F.explode(cells).alias("c"))
        .select(*group_cols, key_col, F.col("c.d").alias("d"), F.col("c.w").alias("w"))
    )
    joined = probes.join(
        F.broadcast(sketches.select(*group_cols, "d", "w", "cnt")),
        on=[*group_cols, "d", "w"],
        how="left",
    )
    return joined.groupBy(*group_cols, key_col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est_count")
    )


# ----------------------------------------------------------------------
# Histogram sketches: the QUANTILE face of the family. Fixed uniform
# bins over a declared [lo, hi) — one (group..., bin, cnt) row per
# touched bin — so per-day sketches merge with a groupBy-sum and any
# quantile over any period interpolates from <= n_bins rows. The
# declared range is the contract that makes merging sound (two
# sketches binned over different ranges are different sketches;
# geometry rides as columns and the estimator refuses mixtures, like
# the CMS). Error is by construction <= one bin width — a DETERMINISTIC
# bound, unlike approx_percentile's probabilistic one, and the whole
# pipeline is plain arithmetic a second engine can replicate.


def histogram_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 256,
) -> DataFrame:
    """One histogram per group as (group..., bin, cnt, lo, hi, n_bins)
    rows. Values are clamped into the declared range (out-of-range
    mass lands in the edge bins — visible as edge spikes, the signal
    to re-declare the range); NULLs are dropped. Construction is one
    groupBy with map-side partial sums."""
    group_cols = group_cols or []
    v = F.col(value_col).cast("double")
    width = (hi - lo) / n_bins
    b = F.floor((v - F.lit(float(lo))) / F.lit(float(width))).cast("long")
    bin_ = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), b))
    return (
        df.where(v.isNotNull())
        .select(*group_cols, bin_.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("lo", F.lit(float(lo)))
        .withColumn("hi", F.lit(float(hi)))
        .withColumn("n_bins", F.lit(n_bins))
    )


def histogram_merge(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge histogram cell rows (union of per-day tables, or a rollup
    dropping group columns): groupBy-sum over the bounded bin table —
    merging per-day histograms equals histogramming the union."""
    group_cols = group_cols or []
    return (
        sketches.groupBy(*group_cols, "bin", "lo", "hi", "n_bins")
        .agg(F.sum("cnt").alias("cnt"))
        .select(*group_cols, "bin", "cnt", "lo", "hi", "n_bins")
    )


def histogram_quantiles(
    sketches: DataFrame,
    quantiles: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: for each q, the
    first bin whose cumulative count reaches rank ceil(q*N), linearly
    interpolated within the bin — deterministic arithmetic with error
    <= one bin width. Output: (group..., q, est). The window/cumsum
    runs over the <= n_bins-row sketch table, never the corpus."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    geom = sketches.select("lo", "hi", "n_bins").distinct().collect()
    if not geom:
        raise ValueError("histogram_quantiles: sketch table is empty")
    if len(geom) != 1:
        raise ValueError(
            f"histogram_quantiles: sketch table mixes geometries {geom} — "
            "merge only sketches with identical (lo, hi, n_bins)"
        )
    lo, hi, n_bins = geom[0].lo, geom[0].hi, geom[0].n_bins
    width = (hi - lo) / n_bins
    w = Window.partitionBy(*group_cols).orderBy("bin")
    cum = (
        sketches.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("cum_prev", F.col("cum") - F.col("cnt"))
        .withColumn("n_total", F.sum("cnt").over(Window.partitionBy(*group_cols)))
    )
    qs = F.explode(
        F.array(*[F.lit(float(q)) for q in quantiles])
    ).alias("q")
    expanded = cum.select(*cum.columns, qs).withColumn(
        "rank", F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("n_total")))
    )
    hit = expanded.where(
        (F.col("cum") >= F.col("rank")) & (F.col("cum_prev") < F.col("rank"))
    )
    est = (
        F.lit(float(lo))
        + (
            F.col("bin")
            + (F.col("rank") - F.col("cum_prev")) / F.col("cnt")
        )
        * F.lit(float(width))
    )
    return hit.select(
        *group_cols, "q", F.round(est, 6).alias("est")
    )
