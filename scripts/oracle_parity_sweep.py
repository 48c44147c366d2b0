"""Oracle-parity sweep at an arbitrary scale factor (default sf0.1 —
10x the driver's correctness gate): runs every oracle-backed catalog
query on Spark AND DuckDB at $SPARK_GRAFT_SF_DIR and compares
row-count + order-insensitive typed values, exactly like
tests/test_oracle_parity.py does at sf0.01.

Purpose: catch SCALE-DEPENDENT oracle truths — demos whose oracle is
only exact in a small-cardinality regime (the class of bug the HLL
lgk=12 sketch demo had: exact at 150 distinct users, 1488-vs-1500 at
sf0.1). A parity gate pinned to one scale factor cannot see these;
this sweep runs the same comparison one decade up.

Usage: python scripts/oracle_parity_sweep.py [sf_dir]
(one JSON line on stdout: {"sf_dir", "checked", "mismatches": {...}})
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    import duckdb

    from boatrace_database_spark.queries import ORACLES, QUERIES
    from boatrace_database_spark.session import get_spark

    sys.path.insert(0, "/root/repo/tests")
    from test_oracle_parity import _rows_to_set  # same canonicalizer

    spark = get_spark("oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    mismatches = {}
    checked = 0
    for name, sql in ORACLES.items():
        try:
            sdf = QUERIES[name](spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            atable = con.execute(sql).fetch_arrow_table()
            drows = [tuple(r.values()) for r in atable.to_pylist()]
            dcols = atable.column_names
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            mismatches[name] = {"error": str(exc).split("\n")[0][:200]}
            continue
        checked += 1
        if len(srows) != len(drows):
            mismatches[name] = {
                "rows": [len(srows), len(drows)]
            }
            continue
        a = _rows_to_set(scols, srows)
        b = _rows_to_set(dcols, drows)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y]
            mismatches[name] = {"first_value_diff": repr(diff[:1])[:300]}
        print(f"  {name}: {'MISMATCH' if name in mismatches else 'ok'}"
              f" ({len(srows)} rows)", file=sys.stderr)
    print(json.dumps({
        "sf_dir": SF_DIR, "checked": checked,
        "n_mismatches": len(mismatches), "mismatches": mismatches,
    }))


if __name__ == "__main__":
    main()
