"""Shared table loader for the query catalog.

events.parquet's ts encoding has drifted between driver rounds
(TIMESTAMP(NANOS) → timestamp[us]); ``timeutil.normalize_ts`` absorbs
every observed encoding so `ts` is always a plain TimestampType
downstream. The nanosAsLong conf is still set defensively (it is a
dynamic SQL conf) for the NANOS case, which Spark's reader otherwise
rejects (PARQUET_TYPE_ILLEGAL). DuckDB reads the same file natively;
sub-microsecond ordering ties are broken by event_id in every catalog
query, so micro truncation cannot flip results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from boatrace_database_spark.timeutil import normalize_ts


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver calls queries() on ITS OWN session — pin the dynamic
    # confs our results depend on (timestamp rendering must match the
    # UTC-naive DuckDB oracle regardless of the host session's defaults)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
