"""10x scale-up evidence for the session-6 behavioral/collocation
family: funnel_summary (single-pass fold), funnel_stage_times (join
chain), cohort_retention, and pmi_bigrams at 1x and Rx.

Scaling construction:
- events: replica k shifts user_id by k*10M (disjoint user ranges,
  same time span) and event_id by k*100M — the realistic growth axis
  (more users, same calendar). Funnel/cohort results therefore scale
  exactly: every per-stage user count and every retention cell's
  active_users must be exactly R times the 1x value (hard-asserted).
- documents: scale_dedup_bench.build_docs' per-replica vocabulary
  bijection — replica vocabularies are disjoint, so every 1x bigram
  (w1,w2,c,pmi-shape) reappears once per replica and the PMI pair
  table is exactly R-fold (hard-asserted via count).

Contract (same as the dedup/corpus scale benches): time ratio ~ R at
fixed cores (all ops are scans + key-partitioned aggregates, nothing
materializes cross-row pairs), and heaviest-stage task balance
max/median < 3 via the REST API.

Usage: SPARK_GRAFT_UI=true python scripts/scale_behavior_bench.py
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

REPLICAS = int(os.environ.get("SCALE_REPLICAS", "10"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVENTS_DST = f"/tmp/scale_events_{REPLICAS}x.parquet"
DOCS_DST = f"/tmp/scale_docs_{REPLICAS}x.parquet"

from scale_dedup_bench import build_docs  # noqa: E402
from spark_rest import heaviest_stage_balance, stage_ids  # noqa: E402

STAGES = ["view", "click", "purchase"]


def build_events(spark, replicas: int, dst: str) -> None:
    from pyspark.sql import functions as F

    from boatrace_database_spark.timeutil import normalize_ts

    if os.path.isdir(dst):
        return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    base = normalize_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    # one scan for all replicas: cross the base with the replica index
    # (a broadcast of R rows) instead of unioning R per-replica selects
    # over the same file
    reps = spark.range(replicas).select(F.col("id").alias("k"))
    out = base.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("k") * 100_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("k") * 10_000_000).alias("user_id"),
        "event_type",
        "value",
    )
    n_parts = spark.sparkContext.defaultParallelism
    out.repartition(n_parts, "event_id").write.mode("overwrite").parquet(dst)


def timed(spark, fn):
    before = stage_ids(spark)
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    bal = heaviest_stage_balance(spark, stage_ids(spark) - before)
    return round(dt, 2), n, bal


def run_ops(spark, events, docs):
    from boatrace_database_spark.operators import behavior
    from boatrace_database_spark.operators import text as TX

    out = {}

    def rec(name, fn):
        sec, n, bal = timed(spark, fn)
        out[name] = {"sec": sec, "n": n, "task_balance": bal}
        print(f"  {name}: {sec}s n={n} balance={bal}", file=sys.stderr)

    def funnel_fold():
        rows = behavior.funnel_summary(events, STAGES).collect()
        return {r.stage: r.users for r in rows}

    def funnel_chain():
        frames = behavior.funnel_stage_times(events, STAGES)
        return frames[-1].count()

    def cohort():
        rows = behavior.cohort_retention(events).collect()
        return {
            "cells": len(rows),
            "week0_active": sum(
                r.active_users for r in rows if r.week_offset == 0
            ),
        }

    def pmi():
        return TX.pmi_bigrams(docs, "text", min_count=5).count()

    def transitions():
        rows = behavior.event_transitions(events).collect()
        return {
            "edges": len(rows),
            "n_total": sum(r.n for r in rows),
        }

    rec("funnel_summary_fold", funnel_fold)
    rec("funnel_chain_last_stage", funnel_chain)
    rec("cohort_retention", cohort)
    rec("event_transitions", transitions)
    rec("pmi_bigrams", pmi)
    return out


def main() -> None:
    from boatrace_database_spark.session import get_spark

    spark = get_spark("scale_behavior")
    spark.sparkContext.setLogLevel("ERROR")
    build_events(spark, REPLICAS, EVENTS_DST)
    build_docs(spark, REPLICAS, DOCS_DST)

    from boatrace_database_spark.queries._util import load_table

    ev1 = load_table(spark, SF_DIR, "events")
    evR = spark.read.parquet(EVENTS_DST)
    d1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dR = spark.read.parquet(DOCS_DST)

    print(f"1x: {ev1.count()} events, {d1.count()} docs", file=sys.stderr)
    one = run_ops(spark, ev1, d1)
    print(f"{REPLICAS}x: {evR.count()} events, {dR.count()} docs",
          file=sys.stderr)
    big = run_ops(spark, evR, dR)

    # exact-linearity hard assertions (disjoint users / vocabularies)
    for st in (1, 2, 3):
        assert big["funnel_summary_fold"]["n"][st] == (
            REPLICAS * one["funnel_summary_fold"]["n"][st]
        ), f"funnel stage {st} not R-fold"
    assert big["funnel_chain_last_stage"]["n"] == (
        REPLICAS * one["funnel_chain_last_stage"]["n"]
    )
    assert big["cohort_retention"]["n"]["week0_active"] == (
        REPLICAS * one["cohort_retention"]["n"]["week0_active"]
    )
    assert big["pmi_bigrams"]["n"] == REPLICAS * one["pmi_bigrams"]["n"]
    # disjoint user ranges replicate every adjacency R-fold; the edge
    # VOCABULARY (distinct type pairs) is scale-invariant
    assert big["event_transitions"]["n"]["n_total"] == (
        REPLICAS * one["event_transitions"]["n"]["n_total"]
    )
    assert (
        big["event_transitions"]["n"]["edges"]
        == one["event_transitions"]["n"]["edges"]
    )

    report = {
        "replicas": REPLICAS,
        "loadavg": os.getloadavg(),
        "ops": {
            k: {
                "sec_1x": one[k]["sec"],
                "sec_Rx": big[k]["sec"],
                "time_ratio": round(
                    big[k]["sec"] / max(one[k]["sec"], 1e-9), 2
                ),
                "balance_Rx": big[k]["task_balance"],
            }
            for k in one
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
