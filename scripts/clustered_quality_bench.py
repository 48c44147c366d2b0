"""Recall of the cluster-based similarity operators on a corpus WITH
planted cluster structure, side-by-side with the driver's random-ish
corpus (r5 verdict item 4).

Every recall number shipped through r5 (IVF 0.77 @ nprobe=8, semantic
0.864 @ (16,3)) was measured on near-uniform synthetic embeddings —
the ADVERSARIAL case for quantizer-scoped methods: neighbors scatter
across cells, so recall can only track scan fraction. Real embedding
spaces are clustered (that is the premise of SemDeDup and IVF), so
this script generates a Gaussian-mixture corpus in the same shape as
the driver's embeddings table (2,000 × 64, vec_id/embedding/label)
and re-runs the same quality definitions on both corpora:

- IVF top-k recall across the nprobe dial (n_cells=16, k=10)
- semantic_pairs recall across the n_assign dial (n_cells=16)
- hyperplane-LSH ANN recall at catalog defaults

Mixture: 20 unit centers ~ N(0, I_64)/|| · ||, point = center + σ·ε
with σ=0.06 → within-cluster cosine ≈ 1/(1+σ²d) ≈ 0.81, while
cross-cluster cosine concentrates near 0 (±1/√d ≈ 0.125): separated
but not degenerate. Deterministic seed; the corpus is written next to
a temp dir so the quality module's {sf_dir}/embeddings.parquet
convention applies unchanged.

Usage: python scripts/clustered_quality_bench.py
"""

from __future__ import annotations

import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from boatrace_database_spark.operators import similarity as SIM  # noqa: E402
from boatrace_database_spark import quality as Q  # noqa: E402

RANDOM_DIR = "/root/testdata/sf0.1"
N, DIM, K, SIGMA, SEED = 2000, 64, 20, 0.06, 7


def make_clustered_corpus(spark, out_dir: str) -> None:
    rng = np.random.default_rng(SEED)
    centers = rng.normal(size=(K, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, K, size=N)
    pts = centers[labels] + SIGMA * rng.normal(size=(N, DIM))
    rows = [
        (int(i), [float(x) for x in pts[i]], int(labels[i]))
        for i in range(N)
    ]
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    df.coalesce(4).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def ivf_nprobe_sweep(spark, sf_dir, n_cells=16, k=10, n_queries=10):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < n_queries)
    exact = Q._topk_sets(SIM.cosine_topk(emb, queries, k=k).collect())
    indexed, centroids = SIM.ivf_build_index(emb, n_cells=n_cells)
    out = {}
    for nprobe in (1, 2, 4, 8, 16):
        ivf = Q._topk_sets(
            SIM.ivf_probe(indexed, centroids, queries, k=k, nprobe=nprobe)
            .collect()
        )
        out[nprobe] = round(Q._mean_recall(exact, ivf), 4)
    return out


def lsh_ann_recall(spark, sf_dir, k=10, n_queries=10):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < n_queries)
    exact = Q._topk_sets(SIM.cosine_topk(emb, queries, k=k).collect())
    cand = SIM.lsh_ann_candidates(emb, queries, n_planes=6).persist()
    n_cand = cand.count()
    lsh = Q._topk_sets(
        SIM.lsh_ann_topk(emb, queries, k=k, n_planes=6, candidates=cand)
        .collect()
    )
    cand.unpersist()
    return round(Q._mean_recall(exact, lsh), 4), round(
        n_cand / max(len(exact), 1), 1
    )


def semantic_sweep(spark, sf_dir, threshold, n_cells=16):
    exact = Q._exact_cosine_pairs(spark, sf_dir, threshold, 20_000)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = {"exact_pairs": len(exact)}
    for n_assign in (1, 2, 3):
        sem = {
            (r.id_a, r.id_b)
            for r in SIM.semantic_pairs(
                emb, threshold=threshold, n_cells=n_cells, n_assign=n_assign
            ).collect()
        }
        out[n_assign] = round(len(exact & sem) / max(len(exact), 1), 4)
    return out


def ivfpq_sweep(spark, sf_dir, k=10, n_queries=10):
    """ADC-only vs refined recall on both corpora (BENCHNOTES §29):
    clustered data makes pruning free but quantization-noise-bound,
    which refinement recovers; random data is candidate-bound."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < n_queries)
    exact = Q._topk_sets(SIM.cosine_topk(emb, queries, k=k).collect())
    codes, cents, books = SIM.ivfpq_build_index(
        emb, n_cells=16, n_subspaces=16, n_codes=256
    )
    codes = codes.localCheckpoint(eager=True)
    out = {}
    for label, refine in (("adc", 0), ("refine50", 50)):
        rows = SIM.ivfpq_probe(
            codes, cents, books, queries, k=k, nprobe=8,
            refine=refine, corpus=emb if refine else None,
        ).collect()
        out[label] = round(Q._mean_recall(exact, Q._topk_sets(rows)), 4)
    return out


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="clustered_corpus_")
    make_clustered_corpus(spark, tmp)

    # pair-regime thresholds: random corpus keeps the shipped θ=0.4;
    # the clustered corpus uses θ=0.75 (within-cluster cosine ≈0.81,
    # so 0.75 captures the planted near-dup regime without the
    # cross-cluster noise floor)
    corpora = [("random (driver sf0.1)", RANDOM_DIR, 0.4),
               ("clustered (GMM K=20 σ=0.06)", tmp, 0.75)]
    for name, d, theta in corpora:
        print(f"\n== {name} ==")
        sweep = ivf_nprobe_sweep(spark, d)
        print(f"ivf recall by nprobe (n_cells=16, k=10): {sweep}")
        r, cpq = lsh_ann_recall(spark, d)
        print(f"lsh_ann recall={r} candidates/query={cpq}")
        sem = semantic_sweep(spark, d, theta)
        print(f"semantic recall by n_assign (theta={theta}): {sem}")
        pq = ivfpq_sweep(spark, d)
        print(f"ivfpq recall (S=16/K=256, nprobe=8): {pq}")
    print(f"\nclustered corpus left at: {tmp}")


if __name__ == "__main__":
    main()
