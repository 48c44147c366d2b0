"""Bucketed-table join evidence (warehouse.bucket_write): the same
orders⋈customer sort-merge join at sf0.1, read from plain parquet vs
from co-bucketed tables — measuring the shuffle each plan actually
performs. The bucketed layout should eliminate BOTH join-input
exchanges (the scans come off disk already hash-distributed), leaving
only the write-time shuffle, paid once and amortized over every later
join on the key.

Broadcast is disabled so the join is forced to sort-merge — at 100 TB
the fact-fact join this layout exists for is exactly the one that
cannot broadcast.

Usage: SPARK_GRAFT_UI=true python scripts/bucket_join_bench.py
(one JSON line on stdout; human detail on stderr.)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_UI", "true")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_rest import api, app_id, stage_ids  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BUCKETS = 16


def _shuffle_bytes(spark, new_ids: set[int]) -> dict:
    """Total shuffle read+write bytes over the given stages."""
    app = app_id(spark)
    stages = [
        s
        for s in api(spark, f"/applications/{app}/stages?status=COMPLETE")
        if s["stageId"] in new_ids
    ]
    return {
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 2
        ),
        "shuffle_read_mb": round(
            sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 2
        ),
        "n_stages": len(stages),
    }


def main() -> None:
    from boatrace_database_spark.session import get_spark
    from boatrace_database_spark.warehouse import bucket_write

    spark = get_spark("bucket-join-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")

    def run(label: str, left, right):
        before = stage_ids(spark)
        t0 = time.perf_counter()
        j = (
            left.hint("merge")
            .join(right, left["o_custkey"] == right["c_custkey"])
            .groupBy("c_mktsegment")
            .count()
        )
        rows = j.collect()
        wall = round(time.perf_counter() - t0, 3)
        sh = _shuffle_bytes(spark, stage_ids(spark) - before)
        plan = j._jdf.queryExecution().executedPlan().toString()
        out = {
            "label": label,
            "wall_s": wall,
            "rows": len(rows),
            "join_input_exchanges": plan.count("Exchange")
            - plan.count("Exchange hashpartitioning(c_mktsegment"),
            **sh,
        }
        print(f"  {out}", file=sys.stderr)
        return out

    plain = run("plain_parquet", orders, customer)

    before = stage_ids(spark)
    t0 = time.perf_counter()
    bucket_write(orders, "bb_orders", ["o_custkey"], N_BUCKETS,
                 sort_cols=["o_custkey"])
    bucket_write(customer, "bb_customer", ["c_custkey"], N_BUCKETS,
                 sort_cols=["c_custkey"])
    write_wall = round(time.perf_counter() - t0, 3)
    write_sh = _shuffle_bytes(spark, stage_ids(spark) - before)

    try:
        bucketed = run(
            "bucketed_tables", spark.table("bb_orders"), spark.table("bb_customer")
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS bb_orders")
        spark.sql("DROP TABLE IF EXISTS bb_customer")

    assert plain["rows"] == bucketed["rows"]
    print(
        json.dumps(
            {
                "metric": "bucket_join_bench",
                "sf_dir": SF_DIR,
                "n_buckets": N_BUCKETS,
                "plain": plain,
                "bucketed": bucketed,
                "bucket_write": {"wall_s": write_wall, **write_sh},
                "loadavg": os.getloadavg(),
            }
        )
    )


if __name__ == "__main__":
    main()
