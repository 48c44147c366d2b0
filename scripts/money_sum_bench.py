"""Measure the decimal money-sum tax and its candidate buy-backs (r11
verdict item #3 / finding #2).

Three exact, order-independent formulations of TPC-H q1's money
aggregates, timed at a given sf dir:

  A decimal   — the round-11 shape: cast inputs to DECIMAL, sum
                decimals (products reach DECIMAL(20,6), which Spark
                backs with java.math.BigDecimal — the suspected tax).
  B long-flat — fixed-point: round(col*100) cents as LONG, products
                stay LONG in 1e-4/1e-6 units, one flat long sum.
                Exact while a GROUP's sum fits 2^63 (charge: ~9e7
                rows/group at 1e-6 units) — fails LOUDLY under ANSI
                (overflow throws), but a whole-table group at 100 TB
                WOULD hit it, so flat long is not the scale shape for
                whole-table-magnitude groups.
  C two-level — long partials per (group, spark_partition_id()) —
                bounded by rows-per-TASK, not rows-per-group — then a
                DECIMAL sum over the tiny partial table. Same shuffle
                volume as A/B (map-side combine already emits one row
                per (key, partition)); exact at ANY scale.

Prints one JSON line per variant with wall seconds (median of
``--reps``) and the result hash so exactness is checked in the same
run, plus the DuckDB reference hash.

Usage: python scripts/money_sum_bench.py [sf_dir] [--reps N]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

from pyspark.sql import functions as F


def _q1_filter(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return l.where(l.l_shipdate <= "1998-09-02")


def variant_decimal(spark, sf_dir):
    l = _q1_filter(spark, sf_dir)
    qty = l.l_quantity.cast("decimal(12,2)")
    price = l.l_extendedprice.cast("decimal(12,2)")
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = price * (one - l.l_discount.cast("decimal(4,2)"))
    charge = disc_price * (one + l.l_tax.cast("decimal(4,2)"))
    cnt = F.count("*")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / cnt, 4).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / cnt, 4).alias("avg_price"),
            F.round(
                F.sum(l.l_discount.cast("decimal(4,2)")).cast("double") / cnt, 4
            ).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _cents(col):
    return F.round(col * 100).cast("long")


def _long_terms(l):
    qty_c = _cents(l.l_quantity)
    price_c = _cents(l.l_extendedprice)
    disc_c = _cents(l.l_discount)
    tax_c = _cents(l.l_tax)
    dp = price_c * (F.lit(100).cast("long") - disc_c)  # 1e-4 units
    ch = dp * (F.lit(100).cast("long") + tax_c)  # 1e-6 units
    return qty_c, price_c, disc_c, dp, ch


def variant_long_flat(spark, sf_dir):
    l = _q1_filter(spark, sf_dir)
    qty_c, price_c, disc_c, dp, ch = _long_terms(l)
    cnt = F.count("*")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty_c) / 100.0, 2).alias("sum_qty"),
            F.round(F.sum(price_c) / 100.0, 2).alias("sum_base_price"),
            F.round(F.sum(dp) / 1e4, 2).alias("sum_disc_price"),
            F.round(F.sum(ch) / 1e6, 2).alias("sum_charge"),
            F.round((F.sum(qty_c) / 100.0) / cnt, 4).alias("avg_qty"),
            F.round((F.sum(price_c) / 100.0) / cnt, 4).alias("avg_price"),
            F.round((F.sum(disc_c) / 100.0) / cnt, 4).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def variant_two_level(spark, sf_dir):
    l = _q1_filter(spark, sf_dir)
    qty_c, price_c, disc_c, dp, ch = _long_terms(l)
    partial = l.groupBy(
        "l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid")
    ).agg(
        F.sum(qty_c).alias("qc"),
        F.sum(price_c).alias("pc"),
        F.sum(disc_c).alias("dc"),
        F.sum(dp).alias("dpc"),
        F.sum(ch).alias("chc"),
        F.count("*").alias("n"),
    )

    def dec(c):
        return F.sum(F.col(c).cast("decimal(38,0)"))

    cnt = F.sum("n")
    return (
        partial.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(dec("qc") / 100, 2).cast("double").alias("sum_qty"),
            F.round(dec("pc") / 100, 2).cast("double").alias("sum_base_price"),
            F.round(dec("dpc") / 10000, 2).cast("double").alias("sum_disc_price"),
            F.round(dec("chc") / 1000000, 2).cast("double").alias("sum_charge"),
            F.round((dec("qc") / 100).cast("double") / cnt, 4).alias("avg_qty"),
            F.round((dec("pc") / 100).cast("double") / cnt, 4).alias("avg_price"),
            F.round((dec("dc") / 100).cast("double") / cnt, 4).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def result_hash(df) -> str:
    rows = [tuple(r) for r in df.collect()]
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    from boatrace_database_spark import get_spark

    spark = get_spark("money_sum_bench")
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    con = duckdb.connect()
    # builder output (e.g. /tmp/sf1) is a Spark parquet DIRECTORY
    lpath = f"{sf_dir}/lineitem.parquet"
    if os.path.isdir(lpath):
        lpath = f"{lpath}/*.parquet"
    ref = con.execute(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(l_quantity::DECIMAL(12,2)), 2) AS DOUBLE),
               CAST(round(sum(l_extendedprice::DECIMAL(12,2)), 2) AS DOUBLE),
               CAST(round(sum(l_extendedprice::DECIMAL(12,2)
                    * (1::DECIMAL(3,2) - l_discount::DECIMAL(4,2))), 2) AS DOUBLE),
               CAST(round(sum(l_extendedprice::DECIMAL(12,2)
                    * (1::DECIMAL(3,2) - l_discount::DECIMAL(4,2))
                    * (1::DECIMAL(3,2) + l_tax::DECIMAL(4,2))), 2) AS DOUBLE),
               round(CAST(sum(l_quantity::DECIMAL(12,2)) AS DOUBLE) / count(*), 4),
               round(CAST(sum(l_extendedprice::DECIMAL(12,2)) AS DOUBLE) / count(*), 4),
               round(CAST(sum(l_discount::DECIMAL(4,2)) AS DOUBLE) / count(*), 4),
               count(*)
        FROM '{lpath}'
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).fetchall()
    ref_hash = hashlib.sha256(
        repr([tuple(r) for r in ref]).encode()
    ).hexdigest()[:16]
    print(json.dumps({"variant": "duckdb_ref", "hash": ref_hash}))

    for name, fn in (
        ("A_decimal", variant_decimal),
        ("B_long_flat", variant_long_flat),
        ("C_two_level", variant_two_level),
    ):
        h = result_hash(fn(spark, sf_dir))  # warm + exactness
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            times.append(time.monotonic() - t0)
        times.sort()
        print(
            json.dumps(
                {
                    "variant": name,
                    "median_s": round(times[len(times) // 2], 3),
                    "min_s": round(times[0], 3),
                    "hash": h,
                    "matches_ref": h == ref_hash,
                }
            )
        )


if __name__ == "__main__":
    main()
