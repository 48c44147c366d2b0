"""Shared table loader for the query catalog.

events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
rejects by default (PARQUET_TYPE_ILLEGAL). We read nanos as long
(legacy conf, set defensively at runtime — it is a dynamic SQL conf)
and convert to a microsecond TimestampType with integer division, so
`ts` behaves as a normal timestamp downstream. DuckDB keeps native
TIMESTAMP_NS; sub-microsecond ordering ties are broken by event_id in
every catalog query, so the truncation cannot flip results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver calls queries() on ITS OWN session — pin the dynamic
    # confs our results depend on (timestamp rendering must match the
    # UTC-naive DuckDB oracle regardless of the host session's defaults)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
