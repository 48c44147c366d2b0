"""Isolated timing for a subset of catalog queries: fresh JVM per
invocation, min-of-N within the process after the same warmup bench.py
uses. Usage: python scripts/isolate_bench.py q5_region_revenue [iters]

Exists to separate shared-JVM bench noise from real plan regressions
(VERDICT r2 item 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

from boatrace_database_spark.queries import QUERIES
from boatrace_database_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("isolate")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        samples.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"query": name, "samples": samples, "min": min(samples)}))


if __name__ == "__main__":
    main()
