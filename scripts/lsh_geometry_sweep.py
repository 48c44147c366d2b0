"""Calibration sweep for `lsh_ann_geometry` (r12 verdict item #1).

Measures, per candidate geometry (n_planes, probe_hamming, n_tables):
mean top-k recall vs brute-force cosine, distinct candidates scored
per query, and the candidate FRACTION of the corpus — at each sf dir
given on the command line. The derived rule in similarity.py must hold
recall >= 0.9 with a roughly scale-invariant candidate count; this
script is the evidence behind the (probe, tables) schedule.

Usage: python scripts/lsh_geometry_sweep.py /root/testdata/sf0.1 /tmp/sf1
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from boatrace_database_spark.operators import similarity as SIM  # noqa: E402
from boatrace_database_spark.quality import _mean_recall, _topk_sets  # noqa: E402
from boatrace_database_spark.session import get_spark  # noqa: E402

K = 10
N_QUERIES = 10


def sweep(spark, sf_dir: str) -> None:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = emb.count()
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    exact = _topk_sets(SIM.cosine_topk(emb, queries, k=K).collect())
    derived = SIM.lsh_ann_geometry(n)
    grid = {derived}
    planes = derived[0]
    for probe in (1, 2):
        for tables in (4, 6, 8, 10):
            grid.add((planes, probe, tables))
    if planes > 6:
        grid.add((planes - 1, 2, 4))
        grid.add((planes - 1, 2, 6))
        grid.add((planes + 1, 2, 8))
    for geom in sorted(grid):
        p, h, t = geom
        t0 = time.perf_counter()
        cand = SIM.lsh_ann_candidates(
            emb, queries, n_planes=p, probe_hamming=h, n_tables=t
        ).persist()
        n_cand = cand.count()
        approx = _topk_sets(
            SIM.lsh_ann_topk(
                emb, queries, k=K, n_planes=p, probe_hamming=h,
                n_tables=t, candidates=cand,
            ).collect()
        )
        cand.unpersist()
        dt = time.perf_counter() - t0
        cpq = n_cand / max(len(exact), 1)
        print(json.dumps({
            "sf_dir": sf_dir, "n": n,
            "planes": p, "probe_hamming": h, "tables": t,
            "derived": geom == derived,
            "recall": round(_mean_recall(exact, approx), 4),
            "cand_per_query": round(cpq, 1),
            "cand_frac": round(cpq / n, 4),
            "sec": round(dt, 2),
        }))
    emb.unpersist()


def clustered_anchor(spark, n: int, sigma: float = 0.06) -> None:
    """Recall of the DERIVED geometry on a clustered corpus — the
    regime hyperplane LSH exists for (near neighbors at high cosine),
    vs the driver corpus's near-isotropic worst case where sf1 top-10
    neighbors sit at cosine ≈ 0.5. Deterministic Gaussian mixture:
    n/100 unit centers, per-point noise sigma. Backs the
    `lsh_ann_geometry` docstring's clustered-regime 1.0 claim
    (BENCHNOTES §48)."""
    import numpy as np

    rng = np.random.RandomState(13)
    dim, n_centers = 64, max(1, n // 100)
    C = rng.randn(n_centers, dim)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    X = C[rng.randint(0, n_centers, n)] + sigma * rng.randn(n, dim)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).cache()
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    exact = _topk_sets(SIM.cosine_topk(emb, queries, k=K).collect())
    p, h, t = SIM.lsh_ann_geometry(n)
    cand = SIM.lsh_ann_candidates(
        emb, queries, n_planes=p, probe_hamming=h, n_tables=t
    ).persist()
    n_cand = cand.count()
    approx = _topk_sets(
        SIM.lsh_ann_topk(
            emb, queries, k=K, n_planes=p, probe_hamming=h, n_tables=t,
            candidates=cand,
        ).collect()
    )
    cpq = n_cand / max(len(exact), 1)
    print(json.dumps({
        "corpus": f"clustered(n={n}, sigma={sigma})",
        "planes": p, "probe_hamming": h, "tables": t, "derived": True,
        "recall": round(_mean_recall(exact, approx), 4),
        "cand_per_query": round(cpq, 1),
        "cand_frac": round(cpq / n, 4),
    }))
    cand.unpersist()
    emb.unpersist()


def main() -> None:
    spark = get_spark("lsh-geometry-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    args = sys.argv[1:]
    if args and args[0] == "--clustered":
        clustered_anchor(spark, int(args[1]) if len(args) > 1 else 20000)
        return
    for sf_dir in args or ["/root/testdata/sf0.1"]:
        sweep(spark, sf_dir)


if __name__ == "__main__":
    main()
