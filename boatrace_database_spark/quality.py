"""Driver-visible quality metrics for the no-oracle (hash-based)
operators.

The DuckDB harness can only record row counts for MinHash/SimHash/ANN
queries (their outputs depend on hash functions DuckDB doesn't share),
so their real acceptance criteria — recall against the exact
counterpart — lived only in pytest. This module computes the same
numbers (same parameters as tests/test_llm_ops.py) so bench.py can
emit them in its JSON line and the driver's artifacts show what pytest
asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from boatrace_database_spark.operators import dedup as D
from boatrace_database_spark.operators import similarity as SIM


def _topk_sets(rows) -> dict[int, set[int]]:
    sets: dict[int, set[int]] = {}
    for r in rows:
        sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    return sets


def _mean_recall(exact: dict[int, set[int]], approx: dict[int, set[int]]) -> float:
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    return sum(recalls) / len(recalls) if recalls else 0.0


def ann_recalls(
    spark: SparkSession, sf_dir: str, k: int = 10, n_queries: int = 10
) -> dict[str, float]:
    """Mean top-k recall of the LSH and IVF ANN paths vs brute-force
    cosine (the tests/test_llm_ops.py definitions, bounded query set so
    the exact baseline stays cheap at sf0.1)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < n_queries)
    exact = _topk_sets(SIM.cosine_topk(emb, queries, k=k).collect())
    # the candidate set feeds BOTH numbers (recall's scoring input and
    # the cost-side count), so generate it once and persist
    cand = SIM.lsh_ann_candidates(emb, queries, n_planes=6).persist()
    # the cost side of the recall levers: distinct candidates actually
    # scored per query at the same defaults (bounded by
    # n_tables·(1+probes)·bucket size; full corpus = n-1 per query)
    n_cand = cand.count()
    lsh = _topk_sets(
        SIM.lsh_ann_topk(emb, queries, k=k, n_planes=6, candidates=cand).collect()
    )
    cand.unpersist()
    indexed, centroids = SIM.ivf_build_index(emb, n_cells=16)
    ivf = _topk_sets(
        # nprobe=8/16 matches the catalog demo's operating point
        SIM.ivf_probe(indexed, centroids, queries, k=k, nprobe=8).collect()
    )
    # IVF-PQ at the catalog demo's operating point (S=16/K=256,
    # nprobe=8/16): ADC over codes, so this recall folds quantization
    # loss on top of IVF's cell-pruning loss — the honest number for
    # the 16x-compressed index
    pq_codes, pq_cents, pq_books = SIM.ivfpq_build_index(
        emb, n_cells=16, n_subspaces=16, n_codes=256
    )
    ivfpq = _topk_sets(
        SIM.ivfpq_probe(
            pq_codes, pq_cents, pq_books, queries, k=k, nprobe=8
        ).collect()
    )
    # the refinement dial: exact re-rank of the ADC top-50 short-list
    # (~2.5% of this corpus) against the raw table
    ivfpq_ref = _topk_sets(
        SIM.ivfpq_probe(
            pq_codes,
            pq_cents,
            pq_books,
            queries,
            k=k,
            nprobe=8,
            refine=50,
            corpus=emb,
        ).collect()
    )
    return {
        "ann_lsh_recall": round(_mean_recall(exact, lsh), 4),
        "ann_lsh_candidates_per_query": round(n_cand / max(len(exact), 1), 1),
        "ann_ivf_recall": round(_mean_recall(exact, ivf), 4),
        "ann_ivfpq_recall": round(_mean_recall(exact, ivfpq), 4),
        "ann_ivfpq_refine_recall": round(_mean_recall(exact, ivfpq_ref), 4),
    }


def dedup_recalls(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Recall of the hash-blocked near-dup paths against exact n-gram
    Jaccard (threshold 0.8 — the planted near-dup regime the pytest
    suite asserts on)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    }
    if not exact:
        return {"minhash_lsh_recall": None, "simhash_recall": None}
    mh = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=16, threshold=0.5
        ).collect()
    }
    sh = {
        (r.id_a, r.id_b)
        for r in D.simhash_pairs(docs, "doc_id", "text", max_hamming=12).collect()
    }
    return {
        "minhash_lsh_recall": round(len(exact & mh) / len(exact), 4),
        "simhash_recall": round(len(exact & sh) / len(exact), 4),
    }


#: ONE score matrix per process — both recall metrics threshold the
#: SAME n² matmul instead of each re-reading, re-collecting, and
#: re-multiplying the corpus (the most expensive driver-side step of
#: quality_metrics, done once not twice). Single-entry by design: the
#: matrix can reach ~3.2 GB at the 20k gate, so a per-key dict would
#: pin one per (sf_dir, max_vectors) forever. The key includes the
#: parquet's (mtime, size) fingerprint so a regenerated
#: embeddings.parquet in the same process can never serve a stale
#: ground truth.
_GT_CACHE: dict = {}


def _corpus_fingerprint(path: str):
    import os

    try:
        stt = os.stat(path)
        return (stt.st_mtime_ns, stt.st_size)
    except OSError:
        return None


def _exact_cosine_pairs(
    spark: SparkSession, sf_dir: str, threshold: float, max_vectors: int
) -> set[tuple[int, int]] | None:
    """EXACT all-pairs cosine ground truth as a pair set, computed as
    one driver-side numpy matmul (size-gated — n² scores of a
    broadcast-scale corpus are trivial for the driver, which is
    exactly why the demo corpus can have a ground truth at all).
    Returns None when the corpus exceeds the gate; the ONE definition
    every pair-recall metric below measures against (same rounding,
    same id canonicalization), cached so different thresholds share
    the matmul."""
    import numpy as np

    path = f"{sf_dir}/embeddings.parquet"
    key = (sf_dir, max_vectors, _corpus_fingerprint(path))
    if key not in _GT_CACHE:
        _GT_CACHE.clear()  # single entry: bound memory, drop stale
        emb = spark.read.parquet(path)
        if emb.count() > max_vectors:
            _GT_CACHE[key] = None
        else:
            pdf = emb.select("vec_id", "embedding").toPandas()
            ids = pdf["vec_id"].to_numpy()
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            _GT_CACHE[key] = (ids, np.round(Mn @ Mn.T, 4))
    cached = _GT_CACHE[key]
    if cached is None:
        return None
    ids, S = cached
    iu = np.triu_indices(len(ids), k=1)
    hits = S[iu] >= threshold
    return {
        (int(min(a, b)), int(max(a, b)))
        for a, b in zip(ids[iu[0]][hits], ids[iu[1]][hits])
    }


def lsh_cosine_pairs_recall(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.45,
    max_vectors: int = 20_000,
) -> dict[str, float]:
    """Recall of the banded `cosine_pairs_lsh` path against the shared
    `_exact_cosine_pairs` ground truth."""
    exact = _exact_cosine_pairs(spark, sf_dir, threshold, max_vectors)
    if not exact:
        return {"lsh_cosine_pairs_recall": None}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lsh = {
        (r.id_a, r.id_b)
        for r in SIM.cosine_pairs_lsh(emb, threshold=threshold).collect()
    }
    return {
        "lsh_cosine_pairs_recall": round(len(exact & lsh) / len(exact), 4)
    }


def semantic_dedup_recall(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.4,
    n_cells: int = 16,
    n_assign: int = 3,
    max_vectors: int = 20_000,
) -> dict[str, float]:
    """Pair recall of cluster-scoped `semantic_pairs` (the catalog's
    semantic_dedup_assign operating point) vs the shared
    `_exact_cosine_pairs` ground truth. Precision is 1.0 by
    construction (within-cell scoring is exact), so recall is the one
    number that moves with n_assign/n_cells."""
    exact = _exact_cosine_pairs(spark, sf_dir, threshold, max_vectors)
    if not exact:
        return {"semantic_dedup_recall": None}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sem = {
        (r.id_a, r.id_b)
        for r in SIM.semantic_pairs(
            emb, threshold=threshold, n_cells=n_cells, n_assign=n_assign
        ).collect()
    }
    return {"semantic_dedup_recall": round(len(exact & sem) / len(exact), 4)}


def quality_metrics(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    out.update(ann_recalls(spark, sf_dir))
    out.update(dedup_recalls(spark, sf_dir))
    out.update(lsh_cosine_pairs_recall(spark, sf_dir))
    out.update(semantic_dedup_recall(spark, sf_dir))
    return out
