"""Throughput of the streaming dedup family at sf0.1 (r5 verdict
item 8): the family has batch-parity, shuffled-replay, and TTL
contract tests, but no rows/s number — this measures one.

Method: the sf0.1 documents table (5,000 docs) is split into
``N_CHUNKS`` parquet files up front; each op starts a fresh query on
an empty source dir, the chunks are copied in one at a time with a
``processAllAvailable()`` barrier after each (so every chunk is one
micro-batch — the steady-state shape of a file-source stream, not one
giant cold batch), and rows/s = 5,000 / wall time from first delivery
to last barrier. State at end = 5,000 keys for exact (one fingerprint
per distinct text), one (band, bucket) shard per minhash band
(bounded by bands·distinct buckets), one 8-bit chunk shard per
simhash chunk. Startup (query + state store init) is inside the
measurement — it is amortized over 10 batches, as deployed.

Numbers land in BENCHNOTES; re-run with a quiet host, min-of-2.

Usage: python scripts/stream_throughput_bench.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from boatrace_database_spark.streaming import ingest as I  # noqa: E402

SRC = "/root/testdata/sf0.1/documents.parquet"
N_CHUNKS = int(os.environ.get("STREAM_TP_CHUNKS", "10"))


def stage_chunks(spark, workdir: str) -> list[str]:
    """Pre-split the corpus into N single-file chunks (staged OUTSIDE
    the measured window)."""
    docs = spark.read.parquet(SRC)
    n = docs.count()
    per = -(-n // N_CHUNKS)
    chunks = []
    for i in range(N_CHUNKS):
        stage = f"{workdir}/stage{i}"
        (
            docs.where(
                (F.col("doc_id") >= i * per) & (F.col("doc_id") < (i + 1) * per)
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = next(
            f"{stage}/{f}" for f in os.listdir(stage) if f.endswith(".parquet")
        )
        chunks.append(part)
    return chunks


def drive(name: str, start_query, spark, chunks, workdir: str) -> dict:
    src = f"{workdir}/src_{name}"
    os.makedirs(src)
    q = start_query(src)
    t0 = time.monotonic()
    try:
        for i, part in enumerate(chunks):
            shutil.copy(part, f"{src}/c{i}.parquet")
            q.processAllAvailable()
        dt = time.monotonic() - t0
        n_out = spark.sql(f"SELECT count(*) FROM {name}").collect()[0][0]
    finally:
        q.stop()
    return {"sec": round(dt, 2), "rows_per_sec": round(5000 / dt, 0),
            "sink_rows": n_out}


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.streaming.stateStore.maintenanceInterval", "300s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="stream_tp_")
    schema = spark.read.parquet(SRC).schema
    chunks = stage_chunks(spark, workdir)

    results = {}
    results["sd_exact"] = drive(
        "sd_exact",
        lambda src: I.stream_dedup_exact(
            spark, src, schema, query_name="sd_exact"
        ),
        spark, chunks, workdir,
    )
    results["sd_minhash"] = drive(
        "sd_minhash",
        lambda src: I.stream_dedup_minhash(
            spark, src, schema, query_name="sd_minhash"
        ),
        spark, chunks, workdir,
    )
    results["sd_simhash"] = drive(
        "sd_simhash",
        lambda src: I.stream_dedup_simhash(
            spark, src, schema, query_name="sd_simhash"
        ),
        spark, chunks, workdir,
    )

    # the stateless stream-static gate, for contrast with the stateful
    # family: thresholds calibrated outside the measured window (the
    # deployment shape), scoring all codegen, no state store at all
    from boatrace_database_spark.operators import corpus as C
    from boatrace_database_spark.operators import text as TX

    scored = spark.read.parquet(SRC).select(
        "doc_id", "source",
        F.round(TX.quality_score(F.col("text")), 6).alias("quality"),
    )
    thresholds = C.quantile_thresholds(
        scored, "quality", 0.25, group_col="source"
    ).localCheckpoint()
    results["quality_gate"] = drive(
        "quality_gate",
        lambda src: I.stream_quality_gate(
            spark, src, schema, thresholds, query_name="quality_gate"
        ),
        spark, chunks, workdir,
    )

    # the NATIVE event-time dedup (dropDuplicatesWithinWatermark), for
    # contrast with sd_exact's applyInPandasWithState: same
    # first-seen-wins contract on the same fingerprints, but JVM state
    # and no Python worker round-trip — the rows/s gap is the cost of
    # custom per-group logic. Fingerprints and a synthetic event time
    # (doc_id seconds) are staged OUTSIDE the measured window.
    fp_docs = spark.read.parquet(SRC).select(
        "doc_id",
        F.md5(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        ).alias("fp"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")).alias(
            "ts"
        ),
    )
    n_docs = fp_docs.count()
    per = -(-n_docs // N_CHUNKS)
    wchunks = []
    for i in range(N_CHUNKS):
        stage = f"{workdir}/wstage{i}"
        (
            fp_docs.where(
                (F.col("doc_id") >= i * per) & (F.col("doc_id") < (i + 1) * per)
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        wchunks.append(next(
            f"{stage}/{f}" for f in os.listdir(stage) if f.endswith(".parquet")
        ))
    src = f"{workdir}/src_sd_watermark"
    os.makedirs(src)
    q = I.stream_dedup_within_watermark(
        spark, src, fp_docs.schema, ["fp"], ts_col="ts",
        delay="1 hour", query_name="sd_watermark",
    )
    t0 = time.monotonic()
    try:
        for i, part in enumerate(wchunks):
            shutil.copy(part, f"{src}/c{i}.parquet")
            q.processAllAvailable()
        dt = time.monotonic() - t0
        n_out = spark.sql("SELECT count(*) FROM sd_watermark").collect()[0][0]
    finally:
        q.stop()
    results["sd_watermark_native"] = {
        "sec": round(dt, 2), "rows_per_sec": round(n_docs / dt, 0),
        "sink_rows": n_out,
    }

    # the semantic twin streams VECTORS (sf0.1 embeddings, 2,000 rows)
    # against a prebuilt static quantizer — smaller corpus, so rows/s
    # is reported against its own row count
    from boatrace_database_spark.operators.similarity import ivf_build_index

    emb_src = "/root/testdata/sf0.1/embeddings.parquet"
    emb = spark.read.parquet(emb_src)
    n_emb = emb.count()
    _, centroids = ivf_build_index(emb, n_cells=16)
    eschema = emb.schema
    per = -(-n_emb // N_CHUNKS)
    echunks = []
    for i in range(N_CHUNKS):
        stage = f"{workdir}/estage{i}"
        (
            emb.where(
                (F.col("vec_id") >= i * per) & (F.col("vec_id") < (i + 1) * per)
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        echunks.append(next(
            f"{stage}/{f}" for f in os.listdir(stage) if f.endswith(".parquet")
        ))
    src = f"{workdir}/src_sd_semantic"
    os.makedirs(src)
    q = I.stream_dedup_semantic(
        spark, src, eschema, centroids, threshold=0.4,
        max_members=10**6, query_name="sd_semantic",
    )
    t0 = time.monotonic()
    try:
        for i, part in enumerate(echunks):
            shutil.copy(part, f"{src}/c{i}.parquet")
            q.processAllAvailable()
        dt = time.monotonic() - t0
        n_out = spark.sql("SELECT count(*) FROM sd_semantic").collect()[0][0]
    finally:
        q.stop()
    results["sd_semantic"] = {
        "sec": round(dt, 2), "rows_per_sec": round(n_emb / dt, 0),
        "sink_rows": n_out, "corpus_rows": n_emb,
    }

    # the session-6 behavioral pair streams EVENTS (sf0.1, 100k rows,
    # ts-ordered chunks — the in-order delivery their parity contracts
    # assume); rows/s against the event count
    from boatrace_database_spark.queries._util import load_table

    ev = load_table(spark, "/root/testdata/sf0.1", "events")
    n_ev = ev.count()
    # chunk boundaries from quantiles of the epoch — no full-column
    # collect to the driver (ties at a cut land in the earlier chunk,
    # which is all the ts-ordered delivery contract needs)
    import datetime as _dt

    probs = [i / N_CHUNKS for i in range(1, N_CHUNKS)]
    qs = ev.select(
        F.col("ts").cast("double").alias("t")
    ).approxQuantile("t", probs, 0.001)
    cuts = [_dt.datetime.utcfromtimestamp(q) for q in qs]
    bounds = [None] + cuts + [None]
    vchunks = []
    for i in range(N_CHUNKS):
        cond = F.lit(True)
        if bounds[i] is not None:
            cond = cond & (F.col("ts") > bounds[i])
        if bounds[i + 1] is not None:
            cond = cond & (F.col("ts") <= bounds[i + 1])
        stage = f"{workdir}/vstage{i}"
        ev.where(cond).coalesce(1).write.mode("overwrite").parquet(stage)
        vchunks.append(next(
            f"{stage}/{f}" for f in os.listdir(stage) if f.endswith(".parquet")
        ))
    for name, starter in (
        (
            "ev_funnel",
            lambda src: I.stream_funnel(
                spark, src, ev.schema, query_name="ev_funnel"
            ),
        ),
        (
            "ev_edges",
            lambda src: I.stream_event_edges(
                spark, src, ev.schema, query_name="ev_edges"
            ),
        ),
        (
            "ev_cohort",
            lambda src: I.stream_cohort_activity(
                spark, src, ev.schema, cohort_event="signup",
                query_name="ev_cohort",
            ),
        ),
        # the native-windowed-aggregate sketch twins, for contrast
        # with the applyInPandasWithState family above: no Python
        # worker in the loop at all
        (
            "ev_hll_rollup",
            lambda src: I.stream_sketch_rollup(
                spark, src, ev.schema, key_col="user_id",
                window="1 day", watermark="0 seconds",
                query_name="ev_hll_rollup",
            ),
        ),
        (
            "ev_cms_rollup",
            lambda src: I.stream_cms_rollup(
                spark, src, ev.schema, key_col="event_type",
                window="1 day", watermark="0 seconds",
                query_name="ev_cms_rollup",
            ),
        ),
    ):
        src = f"{workdir}/src_{name}"
        os.makedirs(src)
        q = starter(src)
        t0 = time.monotonic()
        try:
            for i, part in enumerate(vchunks):
                shutil.copy(part, f"{src}/c{i}.parquet")
                q.processAllAvailable()
            dt = time.monotonic() - t0
            n_out = spark.sql(f"SELECT count(*) FROM {name}").collect()[0][0]
        finally:
            q.stop()
        results[name] = {
            "sec": round(dt, 2), "rows_per_sec": round(n_ev / dt, 0),
            "sink_rows": n_out, "corpus_rows": n_ev,
        }
    import json

    print(json.dumps({
        "corpus_rows": 5000, "n_chunks": N_CHUNKS, "sf": 0.1,
        "loadavg": os.getloadavg(), "results": results,
    }))


if __name__ == "__main__":
    main()
