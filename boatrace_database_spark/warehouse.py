"""Warehouse orchestration: raw TXT -> silver parquet -> gold race table,
registered views, legacy query API, and reference-layout CSV export.

Maps the reference's storage operators (SURVEY §2.1):
- S5 SQLite append sink  -> Parquet tables partitioned by race_date
- S6 SQL table scan      -> spark.table(name) over registered views
- S7 DB reset            -> mode("overwrite") rebuild
- S4 CSV sink            -> export_reference_csvs (one file per day,
                            UTF-8 + header, reference table/odds layout)
- S8 output-path derivation -> the {table}/{date}.csv naming scheme
- P11-P13 interactive queries -> day_slice / day_range / full scan

Scale notes: every table partitions by race_date, so P11's LIKE-prefix
day query prunes to one partition; the silver build reads raw bytes
once (fused decode+parse) and writes all four tables from the cached
one-pass parse (the reference re-scans each K file 3x; SURVEY §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from boatrace_database_spark import schemas as S
from boatrace_database_spark.gold import race_table
from boatrace_database_spark.parse.kernel import parse_txt_files
from boatrace_database_spark.silver import silver_tables

SILVER_TABLES = ("schedule", "result", "odds", "env", "result_ext", "race_meta")


def build_warehouse(
    spark: SparkSession, txt_glob: str, warehouse_dir: str
) -> dict[str, DataFrame]:
    """Full rebuild (reference __main__ semantics: delete + reload,
    main.py:283-294 — here an idempotent overwrite, no duplicate-append
    defect; SURVEY §2.4 documents why per-rebuild semantics are the
    intended ones)."""
    parsed = parse_txt_files(spark, txt_glob).persist()
    tables = silver_tables(parsed)
    for name in SILVER_TABLES:
        (
            tables[name]
            .write.mode("overwrite")
            .partitionBy("race_date")
            .parquet(f"{warehouse_dir}/{name}")
        )
    # build gold from the written silver (stable lineage, cache-free)
    silver = {
        name: spark.read.parquet(f"{warehouse_dir}/{name}")
        for name in SILVER_TABLES
    }
    race = race_table(silver["result"], silver["env"], silver["schedule"])
    race.write.mode("overwrite").partitionBy("race_date").parquet(
        f"{warehouse_dir}/race"
    )
    parsed.unpersist()
    return register_views(spark, warehouse_dir)


def register_views(spark: SparkSession, warehouse_dir: str) -> dict[str, DataFrame]:
    """S6: make every table addressable by name in spark.sql."""
    out = {}
    for name in (*SILVER_TABLES, "race"):
        path = f"{warehouse_dir}/{name}"
        if os.path.exists(path):
            df = spark.read.parquet(path)
            # partition-type inference turns 'YYYY-MM-DD' into DateType on
            # read-back; keep the column a string like the silver layer
            df = df.withColumn("race_date", F.col("race_date").cast("string"))
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


# --------------------------------------------------------------------------
# legacy interactive queries (read_db.py shapes)
def day_slice(df: DataFrame, date: str) -> DataFrame:
    """P11: ``WHERE レースID LIKE '2020-09-28%'`` (read_db.py:19).

    Uses the race_date partition column -> partition pruning; the
    LIKE-prefix on the legacy string column stays available verbatim
    (note: Spark SQL needs the non-ASCII identifier back-quoted).
    """
    return df.where(F.col("race_date") == date)


def day_range(df: DataFrame, dates: list[str]) -> DataFrame:
    """P12: disjunctive LIKE-prefix (read_db.py:22-27) -> isin pruning."""
    return df.where(F.col("race_date").isin(dates))


def merge_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    keys: list[str],
) -> DataFrame:
    """MERGE-style upsert without a lake format: replace target rows
    whose key appears in `updates`, keep the rest, append the new ones
    (anti-join + union). The use case is late corrections — the
    official site occasionally republishes a day's results.

    At scale this rewrites only the touched race_date partitions:
    updates are sliced per partition value and each partition
    overwrites independently (dynamic partition overwrite semantics).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    target = spark.read.parquet(table_dir).withColumn(
        "race_date", F.col("race_date").cast("string")
    )
    merged = target.join(updates.select(*keys), on=keys, how="left_anti").unionByName(
        updates
    )
    # touched partitions only — dynamic mode leaves the rest in place.
    # localCheckpoint materializes the merged rows BEFORE the overwrite
    # deletes the source files they were read from.
    touched = [r[0] for r in updates.select("race_date").distinct().collect()]
    staged = (
        merged.where(F.col("race_date").isin(touched)).localCheckpoint(eager=True)
    )
    staged.write.mode("overwrite").partitionBy("race_date").parquet(table_dir)
    # drop the stale shared file-status cache for this path
    spark.catalog.refreshByPath(table_dir)
    return spark.read.parquet(table_dir).withColumn(
        "race_date", F.col("race_date").cast("string")
    )


# --------------------------------------------------------------------------
# S4/S8: reference-layout CSV export
def export_reference_csvs(
    tables: dict[str, DataFrame], out_dir: str, dates: list[str] | None = None
) -> list[str]:
    """Write per-day CSVs in the committed reference layout:
    ``table/{date}.csv`` (21-col joined race) and ``odds/{date}.csv``.

    One file per day mirrors the reference byte layout, so each slice
    coalesces to a single writer task — correct here (a day is ~1k
    rows), not a pattern for large outputs.
    """
    import csv

    race = race_table(tables["result"], tables["env"], tables["schedule"])
    odds = tables["odds"]
    written: list[str] = []
    for sub, df, cols in (
        ("table", race, [c for c in race.columns if c != "race_date"]),
        ("odds", odds, [c for c in odds.columns if c != "race_date"]),
    ):
        os.makedirs(f"{out_dir}/{sub}", exist_ok=True)
        pdf = df.toPandas()
        for date, group in pdf.groupby(pdf["race_date"].astype(str)):
            if dates and date not in dates:
                continue
            path = f"{out_dir}/{sub}/{date}.csv"
            with open(path, "w", encoding="utf-8", newline="") as fh:
                w = csv.writer(fh)
                w.writerow(cols)
                w.writerows(group[cols].itertuples(index=False, name=None))
            written.append(path)
    return written
