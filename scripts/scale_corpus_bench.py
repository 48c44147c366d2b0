"""10x scale-up evidence for the corpus-assembly family (the same
contract scale_dedup_bench.py gives the dedup family): split_assign /
split_exact / split_exact_stratified / global_shuffle /
take_token_budget / mixture_resample / pack_sequences /
quantile_gate (exact + approx) / bpe_train + bpe_encode_count /
hll_sketch_rollup / cms_sketch_estimate / histogram_quantiles /
dsir_sample /
normalize_width (roundtrip) at 1x and Rx of the sf0.1 documents
corpus.

Reuses scale_dedup_bench.build_docs (per-replica vocabulary bijection,
disjoint doc_id ranges, written to /tmp parquet so runs scan real
input splits). These operators are all projection + one bucket/group
keyed shuffle, so the contract is:

  - time ratio ~ R at fixed cores (work is R-fold, no superlinear
    blowup: no op materializes cross-row pairs);
  - semantics hold at Rx: split_exact sizes still exactly
    floor/ceil(f*n) at n=50,000, global_shuffle is still the exact
    permutation 0..n-1, take_token_budget still stops at the same
    token budget (its kept prefix is budget-bound, corpus-size-free);
  - task balance of the heaviest stage <3x max/median (REST API,
    same guard as the parse and dedup benches).

Aggregations deliberately TOUCH the computed columns (max rank, split
histogram) so Catalyst cannot prune the windows the bench exists to
measure.

Usage: SPARK_GRAFT_UI=true python scripts/scale_corpus_bench.py
(one JSON line on stdout; human detail on stderr).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_UI", "true")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPLICAS = int(os.environ.get("SCALE_REPLICAS", "10"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DOCS_DST = f"/tmp/scale_docs_{REPLICAS}x.parquet"

from scale_dedup_bench import build_docs  # noqa: E402
from spark_rest import heaviest_stage_balance, stage_ids  # noqa: E402


def timed(spark, fn):
    before = stage_ids(spark)
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    bal = heaviest_stage_balance(spark, stage_ids(spark) - before)
    return round(dt, 2), n, bal


def run_ops(spark, docs, n_rows):
    import math

    from pyspark.sql import functions as F

    from boatrace_database_spark.operators import corpus as C

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {}

    def rec(name, fn, check=None):
        dt, n, bal = timed(spark, fn)
        out[name] = {"sec": dt, "n": n, "task_balance": bal}
        if check is not None:
            check(n)
        print(f"  {name}: {dt}s n={n} bal={bal}", file=sys.stderr)

    def split_histogram(frame):
        return {
            r.split: r.c
            for r in frame.groupBy("split")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }

    def check_total(n):
        assert n == n_rows, f"rows dropped: {n} != {n_rows}"

    rec(
        "split_assign",
        lambda: sum(
            split_histogram(C.split_assign(docs, "doc_id", fr)).values()
        ),
        check=check_total,
    )

    def split_exact_counts():
        sizes = split_histogram(C.split_exact(docs, "doc_id", fr))
        for name, f in fr.items():
            got = sizes.get(name, 0)
            assert got in (math.floor(f * n_rows), math.ceil(f * n_rows)), (
                f"{name}: {got} not exact for n={n_rows}"
            )
        return sum(sizes.values())

    rec("split_exact", split_exact_counts, check=check_total)
    rec(
        "split_exact_stratified",
        lambda: sum(
            split_histogram(
                C.split_exact_stratified(
                    docs.withColumn("src", (F.col("doc_id") % 7).cast("int")),
                    "doc_id", "src", fr,
                )
            ).values()
        ),
        check=check_total,
    )

    def check_max_rank(mx):
        assert mx == n_rows - 1, f"not a permutation: max {mx}"

    rec(
        "global_shuffle",
        lambda: C.global_shuffle(docs, "doc_id")
        .agg(F.max("shuffle_pos")).collect()[0][0],
        check=check_max_rank,
    )
    rec(
        "take_token_budget",
        lambda: C.take_token_budget(docs, "doc_id", "text", 100_000)
        .agg(
            F.count(F.lit(1)).alias("kept"), F.max("cum_tokens").alias("mx")
        ).collect()[0].kept,
    )
    rec(
        "mixture_resample",
        lambda: C.mixture_resample(
            docs.withColumn("src", (F.col("doc_id") % 7).cast("int"))
            .withColumn("src", F.col("src").cast("string")),
            "doc_id", "src",
            {"0": 2.5, "1": 0.3}, default_weight=1.0,
        ).count(),
    )
    rec(
        "pack_sequences",
        lambda: C.pack_sequences(
            docs.withColumn("grp", (F.col("doc_id") % 64).cast("int")),
            "doc_id", "text", budget=2048, group_col="grp",
        ).agg(F.max("pack_id")).collect()[0][0],
    )

    def packed_split():
        # the round-7 composition (queries/llm.packed_split_pipeline):
        # pack -> stratified exact split on PACK grain -> train-only
        # shuffle; pack count grows ~R, so time should too
        packs = (
            C.pack_sequences(
                docs.withColumn("grp", (F.col("doc_id") % 64).cast("int")),
                "doc_id", "text", budget=2048, group_col="grp",
            )
            .groupBy("grp", "pack_id")
            .agg(
                F.min("doc_id").alias("pack_key"),
                F.count(F.lit(1)).alias("n_docs"),
            )
            .localCheckpoint()
        )
        split = C.split_exact_stratified(
            packs, "pack_key", "grp", fr
        ).localCheckpoint()
        train = split.where(F.col("split") == "train").select("pack_key")
        pos = C.global_shuffle(train, "pack_key").withColumnRenamed(
            "shuffle_pos", "train_pos"
        )
        return split.join(pos, "pack_key", "left").count()

    rec("packed_split_pipeline", packed_split)

    from boatrace_database_spark.operators import text as TX

    # quantile gate, both physical strategies over the quality score:
    # exact = per-group percent_rank window (one keyed shuffle + sort),
    # approx = sketch thresholds broadcast back (scan + partial agg,
    # NO sort) — the 100 TB path, expected flatter than exact at Rx
    scored = docs.select(
        "doc_id",
        (F.col("doc_id") % 7).cast("string").alias("src"),
        F.round(TX.quality_score(F.col("text")), 6).alias("q"),
    ).localCheckpoint(eager=False)
    rec(
        "quantile_gate_exact",
        lambda: C.quantile_gate(scored, "q", 0.25, group_col="src").count(),
    )
    rec(
        "quantile_gate_approx",
        lambda: C.quantile_gate(
            scored, "q", 0.25, group_col="src", exact=False
        ).count(),
    )

    def width_roundtrip_violations():
        # widen then normalize must reproduce the original text on every
        # row (ASCII corpus): violations==0 is the semantic check, and
        # summing lengths of BOTH computed columns stops Catalyst from
        # pruning either translate.
        wide = TX.widen_width(F.col("text"))
        row = docs.select(
            F.length(wide).alias("wl"),
            (TX.normalize_width(wide) != F.col("text")).cast("int").alias("bad"),
        ).agg(F.sum("wl"), F.sum("bad").alias("violations")).collect()[0]
        assert row.violations == 0, f"roundtrip broke on {row.violations} rows"
        return int(row.violations)

    rec("normalize_width_roundtrip", width_roundtrip_violations)

    # BPE: training cost tracks the WORD-FREQUENCY table (10x replicas
    # have disjoint vocabularies -> 10x vocab rows), encode tracks the
    # corpus. Warm the pandas-UDF worker pool before the 1x timing
    # (cold 1x flatters linearity — the r6 retrieval-bench lesson).
    warm = docs.limit(20).localCheckpoint()
    TX.bpe_encode_count(warm, "text", [("a", "b")]).count()
    learned = {}

    def train():
        learned["m"] = TX.bpe_train(docs, n_merges=8)
        return len(learned["m"])

    rec("bpe_train_8_merges", train)
    rec(
        "bpe_encode_count",
        lambda: TX.bpe_encode_count(docs, "text", learned["m"])
        .agg(F.sum("bpe_tokens")).collect()[0][0],
    )

    # mergeable HLL sketches: build per-(src, bucket-of-100-docs)
    # sketches (partial agg, map-side merge) then roll up per src via
    # sketch union — the whole pipeline is one groupBy + one union
    # over the sketch-table, corpus touched once
    from boatrace_database_spark.operators import sketches as SK

    def sketch_rollup():
        sk = SK.distinct_sketches(
            docs.withColumn("bkt", (F.col("doc_id") % 100).cast("int"))
            .withColumn("src", (F.col("doc_id") % 7).cast("string")),
            "text", ["src", "bkt"],
        )
        rows = SK.union_distinct_estimate(sk, ["src"]).collect()
        return int(sum(r.distinct_estimate for r in rows))

    rec("hll_sketch_rollup", sketch_rollup)

    # CMS frequency + histogram quantile sketches: one corpus pass
    # each, outputs bounded by geometry (depth*width / n_bins rows) —
    # expect time ratio ~R on the build, estimates from the tiny
    # sketch table essentially free
    def cms_estimate_sum():
        keyed = docs.withColumn("src", (F.col("doc_id") % 7).cast("string"))
        sk = SK.cms_sketches(keyed, "src", width=256, depth=4)
        keys = keyed.select("src").distinct()
        rows = SK.cms_estimate(sk, keys, "src").collect()
        assert sum(r.est_count for r in rows) >= n_rows  # never undercount
        return int(sum(r.est_count for r in rows))

    rec("cms_sketch_estimate", cms_estimate_sum)

    def histogram_p50_p99():
        lens = docs.select(F.length("text").alias("len"))
        sk = SK.histogram_sketches(lens, "len", lo=0.0, hi=10000.0, n_bins=256)
        rows = SK.histogram_quantiles(sk, [0.5, 0.99]).collect()
        return int(sum(r.est for r in rows))

    rec("histogram_quantiles", histogram_p50_p99)

    # DSIR importance resample: two corpus passes (model + scoring)
    # joined by an m-bounded broadcast model, Gumbel-top-k is a
    # TakeOrdered — expect time ratio ~R, skew-free (md5 buckets)
    from boatrace_database_spark.operators import selection as SEL

    def dsir():
        target = docs.where(F.col("doc_id") % 11 == 0)
        sel = SEL.dsir_sample(docs, target, "doc_id", "text", k=100, m=4096)
        row = sel.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_grams").alias("g")
        ).collect()[0]
        assert row.n == 100, f"top-k returned {row.n}"
        return int(row.g)

    rec("dsir_sample", dsir)
    return out


def main() -> None:
    from boatrace_database_spark.session import get_spark

    spark = get_spark("scale_corpus")
    spark.sparkContext.setLogLevel("ERROR")
    build_docs(spark, REPLICAS, DOCS_DST)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n1 = base.count()
    scaled = spark.read.parquet(DOCS_DST)
    nR = scaled.count()
    print(f"1x corpus: {n1} rows", file=sys.stderr)
    one = run_ops(spark, base, n1)
    print(f"{REPLICAS}x corpus: {nR} rows", file=sys.stderr)
    big = run_ops(spark, scaled, nR)
    report = {
        "replicas": REPLICAS,
        "rows_1x": n1,
        "rows_Rx": nR,
        "loadavg": os.getloadavg(),
        "ops": {
            k: {
                "sec_1x": one[k]["sec"],
                "sec_Rx": big[k]["sec"],
                "time_ratio": round(big[k]["sec"] / max(one[k]["sec"], 1e-9), 2),
                "balance_Rx": big[k]["task_balance"],
            }
            for k in one
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
