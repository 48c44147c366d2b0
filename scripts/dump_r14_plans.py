"""Dump .explain('formatted') for the round-14-touched queries to
plans/r14/<query>_{before,after}.txt.

Usage: python scripts/dump_r14_plans.py <out_dir> <suffix>
Run once from the round-14-start tree (suffix=before) and once from
HEAD (suffix=after); the judge diffs the pairs against the claims in
OPTIMIZATION_r14.md. The parse-kernel rewrite (kernel.py) is invisible
to Catalyst (same mapInPandas node) — its evidence is the byte-golden
hash pair in the report, not a plan diff.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boatrace_database_spark.queries import QUERIES  # noqa: E402
from boatrace_database_spark.session import get_spark  # noqa: E402

TOUCHED = [
    # bm25 restructure (query-term-restricted postings, hashed terms)
    "bm25_topk_docs",
    "retrieval_rrf_fusion",
    "retrieval_hard_negatives",
    # shingle hashing through the pair join
    "dedup_ngram_jaccard",
    "chunk_dedup_pipeline",
    # behavioral bounded-output single-partition sorts
    "funnel_conversion",
    "funnel_windowed",
    "cohort_retention",
    "event_transitions",
    "attribution_last_touch",
    # connected-components gate fold (limit+toPandas replaces
    # eager-checkpoint+count+toPandas — driver-side, plan of the edges
    # subtree unchanged; dumped for the record)
    "semantic_dedup_assign",
]


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans_r14")
    spark.sparkContext.setLogLevel("ERROR")
    for name in TOUCHED:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"  {name}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
