"""Queries/s of the round-13 streaming SERVING twins at sf0.1: the
dedup family has `stream_throughput_bench.py`; this is the same
steady-state measurement for the query-side streams — stream_ann_serve
(IVF-PQ probe per epoch), stream_bm25_serve (bucket-pruned lexical
probe), stream_hybrid_serve (both + RRF fusion).

Method (the dedup bench's shape): 500 query rows — documents joined
to their embeddings so one source feeds all three twins — are
pre-split into ``N_CHUNKS`` single-file parquet chunks OUTSIDE the
measured window, as are both index builds (serving throughput, not
build). Each twin starts a fresh checkpointed query on an empty
source dir; chunks are copied in one at a time with a
processAllAvailable() barrier after each (every chunk = one
micro-batch, the steady-state file-source shape). queries/s =
500 / wall from first delivery to last barrier; startup is inside
the window, amortized over the batches, as deployed.

Numbers land in BENCHNOTES; re-run with a quiet host, min-of-2.

Usage: python scripts/serving_throughput_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from boatrace_database_spark.operators import retrieval as R  # noqa: E402
from boatrace_database_spark.queries.llm import ivfpq_index_for  # noqa: E402
from boatrace_database_spark.streaming import ingest as I  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = int(os.environ.get("SERVE_TP_QUERIES", "500"))
N_CHUNKS = int(os.environ.get("SERVE_TP_CHUNKS", "10"))
K = 10


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="serve_tp_")
    # cleanup must survive a mid-drive crash (the oracle sweep's
    # r13-ADVICE lesson): a failed twin would otherwise leave the
    # staged chunks + three parquet sinks in /tmp
    import atexit

    atexit.register(shutil.rmtree, workdir, ignore_errors=True)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .where(F.col("doc_id") < N_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("text").alias("query_text"),
            "embedding",
        )
    )
    schema = queries.schema

    # staged OUTSIDE the measured window: query chunks + both indexes
    per = -(-N_QUERIES // N_CHUNKS)
    chunks = []
    for i in range(N_CHUNKS):
        stage = f"{workdir}/stage{i}"
        (
            queries.where(
                (F.col("query_id") >= i * per)
                & (F.col("query_id") < (i + 1) * per)
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        chunks.append(
            next(
                f"{stage}/{f}"
                for f in os.listdir(stage)
                if f.endswith(".parquet")
            )
        )
    codes, cents, books = ivfpq_index_for(spark, SF_DIR)
    bm25_idx = f"{workdir}/bm25"
    R.bm25_write_index(docs, bm25_idx, n_buckets=64)

    def drive(name: str, start_query) -> dict:
        src = f"{workdir}/src_{name}"
        sink = f"{workdir}/sink_{name}"
        os.makedirs(src)
        q = start_query(src, sink, f"{workdir}/ckpt_{name}")
        t0 = time.monotonic()
        try:
            for i, part in enumerate(chunks):
                shutil.copy(part, f"{src}/c{i}.parquet")
                q.processAllAvailable()
            dt = time.monotonic() - t0
            n_out = spark.read.parquet(sink).count()
        finally:
            q.stop()
        return {
            "sec": round(dt, 2),
            "queries_per_sec": round(N_QUERIES / dt, 1),
            "sink_rows": n_out,
        }

    results = {
        "ann_serve": drive(
            "ann",
            lambda src, sink, ckpt: I.stream_ann_serve(
                spark, src, schema, codes, cents, books, sink, ckpt,
                id_col="query_id", k=K, query_name="tp_ann",
            ),
        ),
        "bm25_serve": drive(
            "bm25",
            lambda src, sink, ckpt: I.stream_bm25_serve(
                spark, src, schema, bm25_idx, sink, ckpt,
                k=K, query_name="tp_bm25",
            ),
        ),
        "hybrid_serve": drive(
            "hybrid",
            lambda src, sink, ckpt: I.stream_hybrid_serve(
                spark, src, schema, codes, cents, books, bm25_idx,
                sink, ckpt, k=K, query_name="tp_hybrid",
            ),
        ),
    }
    print(
        json.dumps(
            {
                "n_queries": N_QUERIES,
                "n_chunks": N_CHUNKS,
                "k": K,
                "sf_dir": SF_DIR,
                "loadavg": os.getloadavg(),
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
