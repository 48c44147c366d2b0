"""Whole-catalog decade-up ratio sweep (r9 verdict item #3): time every
catalog entry at sf0.1 AND sf1 and report the 10x-data wall-clock
ratio per query.

Why: the r8 quadratic regressions (`dedup_embedding_cosine` 84x,
`semantic_dedup_assign` 42x) were only visible in a decade-up, and the
headline bench covers 39 of the 146 entries — the rest had only
per-family 10x datapoints from earlier rounds. One whole-catalog pass
closes the class: every entry gets a measured ratio, and anything
above the adjudication bar (~12x, the §40 linear-with-overhead
envelope) is individually examined in BENCHNOTES.

Method matches bench.py: wall-clock around `.collect()`, one
SparkSession, local[32]. Single iteration per (query, sf) — this is a
RATIO audit for scaling-class detection, not a record; host noise of
±30% cannot disguise a quadratic (which shows as 40-100x).

Results stream to stdout as one JSON line per query (resumable audit
trail) plus a final summary line; pass a start index to resume.

Usage: python scripts/catalog_ratio_sweep.py [start_idx] [only_name]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_LO = os.environ.get("SWEEP_LO", "/root/testdata/sf0.1")
SF_HI = os.environ.get("SWEEP_HI", "/tmp/sf1")


def main() -> None:
    from boatrace_database_spark.queries import QUERIES
    from boatrace_database_spark.session import get_spark

    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    only = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("catalog-ratio-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    names = list(QUERIES)
    results = {}
    for i, name in enumerate(names):
        if i < start or (only and name != only):
            continue
        row = {"i": i, "name": name}
        try:
            for key, sf in (("lo", SF_LO), ("hi", SF_HI)):
                t0 = time.perf_counter()
                rows = QUERIES[name](spark, sf).collect()
                row[key] = round(time.perf_counter() - t0, 3)
                row[f"rows_{key}"] = len(rows)
            row["ratio"] = round(row["hi"] / max(row["lo"], 1e-9), 2)
        except Exception as e:  # keep sweeping; report the failure
            row["error"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = row
        print(json.dumps(row), flush=True)
    flagged = {
        n: r["ratio"]
        for n, r in results.items()
        if "ratio" in r and r["ratio"] > 12 and r["hi"] > 1.0
    }
    print(
        json.dumps(
            {
                "summary": True,
                "checked": len(results),
                "errors": [n for n, r in results.items() if "error" in r],
                "flagged_over_12x": dict(
                    sorted(flagged.items(), key=lambda kv: -kv[1])
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
