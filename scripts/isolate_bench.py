"""Isolated timing for a subset of catalog queries: fresh JVM per
invocation, min-of-N within the process after the SAME warmup bench.py
uses (JVM codegen + full python-worker-pool spin-up — without it the
first Arrow query pays 32 interpreter+numpy cold starts and the
numbers aren't comparable to bench.py's).

Usage: python scripts/isolate_bench.py q5_region_revenue [iters]
Runs from any cwd — bootstraps sys.path relative to this file.

Exists to separate shared-JVM bench noise from real plan regressions
(VERDICT r2 item 3 / r3 item 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boatrace_database_spark.queries import QUERIES  # noqa: E402
from boatrace_database_spark.session import get_spark  # noqa: E402


def warmup(spark) -> None:
    """Identical to bench.py's warmup: JVM codegen, then the full
    reused-python-worker pool via a fanned-out Arrow pandas_udf."""
    from pyspark.sql.functions import col, pandas_udf

    spark.range(1000).selectExpr("sum(id)").collect()

    @pandas_udf("double")
    def _warm(v):
        import numpy as np  # noqa: F401  (loads numpy in every worker)

        return v * 1.0

    (
        spark.range(100_000)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(_warm(col("id").cast("double")))
        .count()
    )


def main() -> None:
    name = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("isolate")
    spark.sparkContext.setLogLevel("ERROR")
    warmup(spark)
    samples = []
    rows = 0
    for _ in range(iters):
        t0 = time.perf_counter()
        rows = len(QUERIES[name](spark, sf_dir).collect())
        samples.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "query": name,
                "samples": samples,
                "min": min(samples),
                "rows": rows,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
