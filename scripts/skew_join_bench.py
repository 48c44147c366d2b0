"""AQE skew-join evidence: a sort-merge join with a deliberately
skewed key (80% of the fact side on ONE key) measured with
spark.sql.adaptive.skewJoin enabled vs disabled — the task-balance
numbers behind the engine's 'skewed keys -> AQE splits them' claim
(ARCHITECTURE.md skew-mitigation row; salted_skew_agg covers the
AGGREGATION face, this covers the JOIN face).

Broadcast is disabled for the run (autoBroadcastJoinThreshold=-1) so
the join is forced to sort-merge — at 100 TB the dimension side that
saves you is exactly the one that no longer broadcasts.

Usage: SPARK_GRAFT_UI=true python scripts/skew_join_bench.py
(one JSON line on stdout; human detail on stderr).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_UI", "true")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_rest import stage_ids, straggler  # noqa: E402

N_FACT = 2_000_000
N_KEYS = 10_000
SKEW_FRAC = 0.8


def main() -> None:
    from pyspark.sql import functions as F

    from boatrace_database_spark.session import get_spark

    spark = get_spark("skew-join-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # low advisory sizes so the tiny local dataset still trips the
    # skew detector (defaults are tuned for 64 MB+ partitions)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512k"
    )

    fact = (
        spark.range(N_FACT)
        .select(
            F.when(
                F.col("id") < int(N_FACT * SKEW_FRAC), F.lit(0)
            ).otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
            .cast("long")
            .alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        .localCheckpoint()  # freeze inputs so both runs join identical data
    )
    dim = (
        spark.range(N_KEYS)
        .select(F.col("id").alias("k"), F.sha1(F.col("id").cast("string")).alias("attr"))
        .localCheckpoint()
    )

    def run(skew_enabled: bool):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower()
        )
        before = stage_ids(spark)
        t0 = time.perf_counter()
        row = (
            fact.join(dim, "k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
            .collect()[0]
        )
        dt = time.perf_counter() - t0
        bal = straggler(spark, stage_ids(spark) - before)
        return dt, row, bal

    # warm both plans once (codegen + exchange reuse out of the timing)
    run(True)
    results = {}
    baseline = None
    for name, flag in (("skew_join_off", False), ("skew_join_on", True)):
        dt, row, bal = run(flag)
        if baseline is None:
            baseline = (row.n, float(row.sv))
        else:
            assert (row.n, float(row.sv)) == baseline, "results diverge"
        results[name] = {
            "sec": round(dt, 2),
            "rows_joined": row.n,
            "straggler": bal,
        }
        print(f"{name}: {results[name]}", file=sys.stderr)
    print(json.dumps({
        "n_fact": N_FACT, "n_keys": N_KEYS, "skew_frac": SKEW_FRAC,
        "results": results,
    }))


if __name__ == "__main__":
    main()
