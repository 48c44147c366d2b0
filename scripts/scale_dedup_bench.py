"""10x scale-up evidence for the dedup family (r5: the parse path got
its 100x treatment in scale_parse_bench.py; this is the same contract
for the LLM-pipeline operators).

Corpus construction — replicas must NOT collide across copies, or the
pair structure changes character (every doc would gain R-1 exact
twins and the run measures duplicate blowup, not throughput):
  - documents: replica k rewrites every word w -> w || "r<k>"
    (JVM transform, no Python). A per-replica bijection on the
    vocabulary: within-replica shingle sets and Jaccard relations are
    IDENTICAL to the original corpus, across-replica shingle sets are
    fully disjoint. So for the EXACT operators the output must scale
    exactly linearly (pairs_Rx == R * pairs_1x — asserted); for the
    hash-based ones approximately (signature hash values differ per
    replica, so borderline pairs near the threshold may flip — the
    drift is reported, not asserted).
  - embeddings: replica k flips each dimension's sign by a
    deterministic per-(replica, dim) xxhash64 bit. Sign flips preserve
    norms and within-replica cosines exactly; cross-replica cosines
    are re-randomized (near-isotropic corpus -> almost never above the
    0.45 pair threshold), so LSH-cosine pairs scale ~linearly too.

Both scaled corpora are WRITTEN to /tmp parquet (multiple files) so
the measured runs scan from disk with real input splits, like the
bench.py queries they mirror.

Measures at 1x and Rx on local[$SPARK_GRAFT_CPUS]:
  time, pairs, linearity (pairs_Rx / (R * pairs_1x)), time ratio
  (ideal = R at fixed cores since work is R-fold), and max/median task
  balance of the heaviest stage via the Spark REST API (<3x bar, same
  as the parse bench).

Usage: SPARK_GRAFT_UI=true python scripts/scale_dedup_bench.py
(prints one JSON line on stdout; human detail on stderr).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_UI", "true")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = int(os.environ.get("SCALE_REPLICAS", "10"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DOCS_DST = f"/tmp/scale_docs_{REPLICAS}x.parquet"
EMB_DST = f"/tmp/scale_emb_{REPLICAS}x.parquet"
EMB_1X_DST = "/tmp/scale_emb_1x.parquet"
CUST_DST = f"/tmp/scale_cust_{REPLICAS}x.parquet"
# optional comma-separated op filter, e.g. SCALE_OPS=fuzzy_edit
OPS_FILTER = {
    s for s in os.environ.get("SCALE_OPS", "").split(",") if s
} or None


def build_docs(spark, replicas: int, dst: str) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(dst):
        return
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    parts = []
    for k in range(replicas):
        suffix = F.lit(f"r{k}")
        remapped = F.array_join(
            F.transform(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda w: F.concat(w, suffix),
            ),
            " ",
        )
        parts.append(
            base.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                (F.col("text") if k == 0 else remapped).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    n_parts = spark.sparkContext.defaultParallelism
    out.repartition(n_parts, "doc_id").write.mode("overwrite").parquet(dst)


def build_customers(spark, replicas: int, dst: str) -> None:
    """Fuzzy-join replica construction: replica k prefixes every name
    with a distinct doubled letter ("aa", "bb", ...). Any two replica
    prefixes differ in BOTH characters, so cross-replica name pairs sit
    at Levenshtein distance >= 2 — invisible to a k=1 fuzzy join —
    while within-replica distances are untouched (shared prefix).
    Exact-linear pair scaling (pairs_Rx == R * pairs_1x) is therefore
    a hard assertion, same contract as the disjoint-vocabulary docs."""
    from pyspark.sql import functions as F

    if os.path.isdir(dst):
        return
    base = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    parts = []
    for k in range(replicas):
        prefix = chr(ord("a") + k) * 2
        parts.append(
            base.select(
                (F.col("c_custkey") + k * 10_000_000).alias("c_custkey"),
                F.concat(F.lit(prefix), F.col("c_name")).alias("c_name"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    n_parts = spark.sparkContext.defaultParallelism
    out.repartition(n_parts, "c_custkey").write.mode("overwrite").parquet(dst)


def build_embeddings(spark, replicas: int, dst: str) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(dst):
        return
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # the raw corpus has no >=0.9 pairs, so the deep-band near-dup
    # regime needs PLANTED near-dups: every 50th vector gets a copy
    # with its first component zeroed (cos ~ 0.99), same recipe as
    # tests/test_llm_ops.test_cosine_pairs_lsh_deep_bands_planted.
    planted = base.where(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"),
        F.concat(F.array(F.lit(0.0)), F.slice("embedding", 2, 63)).alias(
            "embedding"
        ),
    )
    seeded = base.select("vec_id", "embedding").unionByName(planted)
    parts = []
    for k in range(replicas):
        # deterministic ±1 per (replica, dim): sign = parity bit of
        # xxhash64(k, dim). Sign flips preserve norms and ALL
        # within-replica cosines (including vector<->planted-copy).
        flipped = F.transform(
            F.col("embedding"),
            lambda v, i: F.when(
                F.xxhash64(F.lit(k), i) % 2 == 0, v
            ).otherwise(-v),
        )
        parts.append(
            seeded.select(
                (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                (F.col("embedding") if k == 0 else flipped).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    n_parts = spark.sparkContext.defaultParallelism
    out.repartition(n_parts, "vec_id").write.mode("overwrite").parquet(dst)


# task-balance probing via the Spark REST API — shared with the parse
# bench (scripts/spark_rest.py) so the guards cannot drift
from spark_rest import heaviest_stage_balance, stage_ids  # noqa: E402


def timed_pairs(spark, fn) -> tuple[float, int, dict]:
    before = stage_ids(spark)
    t0 = time.perf_counter()
    n = fn().count()
    dt = time.perf_counter() - t0
    bal = heaviest_stage_balance(spark, stage_ids(spark) - before)
    return dt, n, bal


def main() -> None:
    from boatrace_database_spark.operators import dedup as D
    from boatrace_database_spark.operators import similarity as SIM
    from boatrace_database_spark.session import get_spark

    spark = get_spark("scale-dedup-bench")
    spark.sparkContext.setLogLevel("ERROR")

    build_docs(spark, REPLICAS, DOCS_DST)
    build_embeddings(spark, REPLICAS, EMB_DST)
    build_embeddings(spark, 1, EMB_1X_DST)  # planted 1x baseline
    build_customers(spark, REPLICAS, CUST_DST)

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docsN = spark.read.parquet(DOCS_DST)
    emb1 = spark.read.parquet(EMB_1X_DST)
    embN = spark.read.parquet(EMB_DST)
    # 1x fuzzy baseline is the RAW table: replica-0's shared "aa"
    # prefix shifts every pairwise distance identically (not at all)
    cust1 = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    custN = spark.read.parquet(CUST_DST)

    ops = {
        "dedup_exact": lambda d: D.exact_dedup(d, ["text"], "doc_id"),
        "ngram_jaccard": lambda d: D.ngram_jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.5
        ),
        "minhash_lsh": lambda d: D.minhash_lsh_pairs(
            d, "doc_id", "text", num_hashes=32, bands=16, threshold=0.5
        ),
        "simhash": lambda d: D.simhash_pairs(d, "doc_id", "text"),
        # deep-band near-dup regime (threshold 0.9, r=8): the documented
        # scale configuration. The shallow catalog-demo config (0.45,
        # r=2) keeps ~90% of all pairs as candidates BY DESIGN and was
        # measured once at 10x: 439 s vs 1.7 s at 1x — the quadratic
        # candidate blowup the docstring warns about. Do not re-run it
        # at scale; that finding lives in BENCHNOTES.
        "cosine_lsh_deep": lambda d: SIM.cosine_pairs_lsh(
            d, threshold=0.9, bands=4, rows_per_band=8, dim=64
        ),
        # semantic dedup scales by growing n_cells WITH the corpus
        # (target cell size constant — the documented dial): fixed
        # cells at Rx data would make per-cell pair work R²-fold.
        # n_assign=1: the scale posture; planted copies (cos ~0.99)
        # nearly always share a nearest cell, so linearity ~1 is
        # expected but reported, not asserted (hash-class op).
        "semantic_dedup": lambda d, nc=16: SIM.semantic_pairs(
            d, threshold=0.9, n_cells=nc, n_assign=1
        ),
        # SymSpell-blocked exact Levenshtein<=1 over customer names:
        # deletion-variant equi-join, so candidates track corpus size,
        # not corpus size squared
        "fuzzy_edit": lambda d: D.edit_distance_pairs(
            d, "c_custkey", "c_name", k=1
        ),
    }
    exact_ops = {"dedup_exact", "ngram_jaccard", "fuzzy_edit"}
    if OPS_FILTER is not None:
        ops = {k: v for k, v in ops.items() if k in OPS_FILTER}

    # warmup (codegen + python worker pool)
    if "minhash_lsh" in ops:
        ops["minhash_lsh"](docs1).count()
    if "cosine_lsh_deep" in ops:
        ops["cosine_lsh_deep"](emb1).count()
    if "fuzzy_edit" in ops:
        ops["fuzzy_edit"](cust1.limit(100)).count()

    results = {}
    for name, fn in ops.items():
        emb_based = name in ("cosine_lsh_deep", "semantic_dedup")
        small, big = (emb1, embN) if emb_based else (docs1, docsN)
        if name == "fuzzy_edit":
            small, big = cust1, custN
        if name == "semantic_dedup":
            dt1, n1, _ = timed_pairs(spark, lambda: fn(small, 16))
            dtN, nN, bal = timed_pairs(
                spark, lambda: fn(big, 16 * REPLICAS)
            )
        else:
            dt1, n1, _ = timed_pairs(spark, lambda: fn(small))
            dtN, nN, bal = timed_pairs(spark, lambda: fn(big))
        linearity = round(nN / max(REPLICAS * n1, 1), 4)
        results[name] = {
            "t_1x": round(dt1, 2),
            "t_Rx": round(dtN, 2),
            "time_ratio": round(dtN / max(dt1, 1e-9), 2),
            "rows_1x": n1,
            "rows_Rx": nN,
            "linearity": linearity,
            "balance_Rx": bal,
        }
        print(f"{name}: {results[name]}", file=sys.stderr)
        # exact operators (dedup groups / Jaccard pairs) must scale
        # EXACTLY linearly under the disjoint-replica construction
        if name in exact_ops:
            assert nN == REPLICAS * n1, (name, n1, nN)

    # IVF-PQ: encode cost tracks the corpus (one Arrow pass over all
    # vectors), probe cost tracks nprobe * avg_cell * n_queries —
    # n_cells grows WITH the corpus like semantic_dedup (constant
    # target cell size), so the probe should stay near-flat while the
    # build is ~R. Timed separately: build-once/probe-many is the
    # deployment shape.
    from pyspark.sql import functions as F

    for label, emb, nc in (
        () if OPS_FILTER is not None and "ivfpq" not in OPS_FILTER
        else (("1x", emb1, 16), ("Rx", embN, 16 * REPLICAS))
    ):
        queries = emb.where(F.col("vec_id") < 10)
        before = stage_ids(spark)
        t0 = time.perf_counter()
        codes, cents, books = SIM.ivfpq_build_index(
            emb, n_cells=nc, n_subspaces=16, n_codes=256
        )
        codes = codes.localCheckpoint(eager=True)
        t_build = time.perf_counter() - t0
        bal_build = heaviest_stage_balance(spark, stage_ids(spark) - before)
        t_probe, n_out = 1e9, 0
        for _ in range(2):
            t0 = time.perf_counter()
            n_out = SIM.ivfpq_probe(
                codes, cents, books, queries, k=10, nprobe=8
            ).count()
            t_probe = min(t_probe, time.perf_counter() - t0)
        results[f"ivfpq_{label}"] = {
            "t_build": round(t_build, 2),
            "t_probe": round(t_probe, 2),
            "rows_out": n_out,
            "n_cells": nc,
            "balance_build": bal_build,
        }
        print(f"ivfpq_{label}: {results[f'ivfpq_{label}']}", file=sys.stderr)

    print(json.dumps({"replicas": REPLICAS, "sf_dir": SF_DIR, "ops": results}))


if __name__ == "__main__":
    main()
