"""Dump .explain('formatted') for the round-13-touched queries to
plans/r13/<query>_{before,after}.txt.

Usage: python scripts/dump_r13_plans.py <out_dir> <suffix>
Run once from the round-13-start worktree (suffix=before) and once from
HEAD (suffix=after); the judge diffs the pairs against the claims in
OPTIMIZATION_r13.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boatrace_database_spark.queries import QUERIES  # noqa: E402
from boatrace_database_spark.session import get_spark  # noqa: E402

TOUCHED = [
    "dedup_simhash",
    "dsir_select_corpus",
    "media_dedup_dhash",
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "semantic_dedup_assign",
    "dedup_embedding_cosine",
    "q1_pricing_summary",
    "bm25_topk_docs",
]


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans_r13")
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
