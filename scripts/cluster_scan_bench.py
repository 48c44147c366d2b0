"""Zone-map clustering evidence for warehouse.cluster_write: lineitem
(sf0.1, 600k rows, l_shipdate spans 1995-2001) written (a) range-clustered on l_shipdate and
(b) hash-scattered, then a one-month range scan timed on each layout
(min-of-5) next to the footer math the reader's pruning actually uses:
the fraction of row groups whose min/max overlaps the predicate.

The footer overlap fraction is the DETERMINISTIC signal (it is exactly
what parquet row-group pruning skips); wall-clock on a 600k-row local
table mostly shows scheduler floor — at 100 TB the skipped row groups
are the difference between a full scan and reads-what-it-needs.

Usage: python scripts/cluster_scan_bench.py   (one JSON line on stdout)
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LO, HI = "1997-03-01", "1997-03-31"


def overlap_fraction(path: str, col: str, lo, hi) -> tuple[int, int]:
    import pyarrow.parquet as pq

    total = hits = 0
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if not (st.max < lo or st.min > hi):
                hits += 1
    return hits, total


def main() -> None:
    import datetime

    from pyspark.sql import functions as F

    from boatrace_database_spark.session import get_spark
    from boatrace_database_spark.warehouse import cluster_write, zorder_write

    spark = get_spark("cluster-scan-bench")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    clustered = "/tmp/cluster_bench_clustered.parquet"
    plain = "/tmp/cluster_bench_plain.parquet"
    zordered = "/tmp/cluster_bench_zorder.parquet"
    cluster_write(li, clustered, ["l_shipdate"], n_files=32)
    li.repartition(32).write.mode("overwrite").parquet(plain)
    zorder_write(li, zordered, ["l_shipdate", "l_orderkey"], n_files=32)

    lo = datetime.datetime.fromisoformat(LO)
    hi = datetime.datetime.fromisoformat(HI + " 23:59:59")
    pred = (F.col("l_shipdate") >= F.lit(LO)) & (F.col("l_shipdate") <= F.lit(HI))

    def scan(path):
        return (
            spark.read.parquet(path)
            .where(pred)
            .agg(F.count(F.lit(1)), F.sum("l_quantity"))
            .collect()[0][0]
        )

    report = {"predicate": f"l_shipdate in [{LO}, {HI}]"}
    for name, path in (
        ("clustered", clustered),
        ("plain", plain),
        ("zordered", zordered),
    ):
        n = scan(path)  # warm
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            n2 = scan(path)
            times.append(time.perf_counter() - t0)
            assert n2 == n
        hits, total = overlap_fraction(path, "l_shipdate", lo, hi)
        report[name] = {
            "rows": n,
            "scan_sec_min5": round(min(times), 3),
            "row_groups_overlapping": hits,
            "row_groups_total": total,
            "decode_fraction": round(hits / total, 3),
        }
        print(f"{name}: {report[name]}", file=sys.stderr)
    assert report["clustered"]["rows"] == report["plain"]["rows"]
    assert report["zordered"]["rows"] == report["plain"]["rows"]

    # the SECOND dimension is z-order's reason to exist: a 5% orderkey
    # slice must prune row groups on the z-ordered layout while the
    # 1-d date-clustered layout decodes everything
    k_lo, k_hi = li.stat.approxQuantile("l_orderkey", [0.0, 0.05], 0.001)
    for name, path in (("clustered", clustered), ("zordered", zordered)):
        hits, total = overlap_fraction(path, "l_orderkey", int(k_lo), int(k_hi))
        report[name]["orderkey_slice_decode_fraction"] = round(hits / total, 3)
        print(
            f"{name} orderkey-slice decode fraction: "
            f"{report[name]['orderkey_slice_decode_fraction']}",
            file=sys.stderr,
        )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
