"""Shared Spark REST-API task-balance probing for the scale benches
(scale_parse_bench.py, scale_dedup_bench.py). One implementation so the
empty-stage guard and the trivial-stage filter cannot drift apart again.

Requires the UI (SPARK_GRAFT_UI=true) — the benches set it before
building their session.
"""

from __future__ import annotations

import json
import urllib.request


def api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1{path}", timeout=10) as r:
        return json.load(r)


def app_id(spark) -> str:
    return api(spark, "/applications")[0]["id"]


def stage_ids(spark) -> set[int]:
    return {s["stageId"] for s in api(spark, f"/applications/{app_id(spark)}/stages")}


def summarize_stage(spark, app: str, stage) -> dict:
    q = api(
        spark,
        f"/applications/{app}/stages/{stage['stageId']}/"
        f"{stage['attemptId']}/taskSummary?quantiles=0.0,0.5,0.95,1.0",
    )
    run = q["executorRunTime"]  # ms at the requested quantiles
    return {
        "stage_id": stage["stageId"],
        "num_tasks": stage["numTasks"],
        "task_ms_median": run[1],
        "task_ms_p95": run[2],
        "task_ms_max": run[3],
        "max_over_median": round(run[3] / max(run[1], 1e-9), 2),
    }


def _real_stages(spark, new_ids: set[int], min_run_ms) -> tuple[str, list]:
    """Completed stages among new_ids heavy enough for balance to mean
    anything (drops e.g. InMemoryFileIndex's thousands of ~0 ms listing
    tasks). Returns (app_id, stages) — stages may be empty."""
    app = app_id(spark)
    stages = [
        s
        for s in api(spark, f"/applications/{app}/stages?status=COMPLETE")
        if s["stageId"] in new_ids
        and s.get("executorRunTime", 0) >= min_run_ms(s)
    ]
    return app, stages


def task_balance(spark, new_ids: set[int]) -> dict:
    """Both the widest stage (max numTasks — typically the scan) and
    the heaviest (max total executorRunTime — typically a shuffle).
    Empty dict when nothing heavy enough completed (tiny replica
    counts) — callers always get a JSON-serializable result."""
    app, real = _real_stages(
        spark, new_ids, lambda s: 1000 * max(1, s["numTasks"] // 100)
    )
    if not real:
        return {}
    widest = max(real, key=lambda s: s["numTasks"])
    heaviest = max(real, key=lambda s: s.get("executorRunTime", 0))
    out = {"widest_stage": summarize_stage(spark, app, widest)}
    if heaviest["stageId"] != widest["stageId"]:
        out["heaviest_stage"] = summarize_stage(spark, app, heaviest)
    return out


def heaviest_stage_balance(spark, new_ids: set[int]) -> dict:
    """Just the heaviest stage's balance (the dedup bench's view)."""
    app, real = _real_stages(spark, new_ids, lambda s: 500)
    if not real:
        return {}
    stage = max(real, key=lambda s: s.get("executorRunTime", 0))
    return summarize_stage(spark, app, stage)


def straggler(spark, new_ids: set[int]) -> dict:
    """The single worst task across ALL new completed stages — the
    skew view: a skewed join's straggler lives in a stage whose TOTAL
    time may still be smaller than the scan's, so per-stage 'heaviest'
    summaries hide it. Reuses summarize_stage (one implementation of
    the taskSummary fetch/shaping, per the module contract)."""
    app, real = _real_stages(spark, new_ids, lambda s: 0)
    summaries = (summarize_stage(spark, app, s) for s in real)
    return max(summaries, key=lambda d: d["task_ms_max"], default={})
