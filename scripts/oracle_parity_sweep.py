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

# deliberately NOT read from SPARK_GRAFT_SF_DIR: an exported bench env
# var must not silently turn the 10x sweep into a re-run of the gate's
# own scale — pass the dir explicitly or take the sf0.1 default
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    import duckdb

    from boatrace_database_spark.queries import ORACLES, QUERIES
    from boatrace_database_spark.session import get_spark

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo_root, "tests"))
    from test_oracle_parity import (  # the gate's EXACT comparison pieces
        _arrow_type_class,
        _rows_to_set,
        _spark_type_class,
    )

    spark = get_spark("oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single files; builder output (e.g. /tmp/sf1)
        # is a Spark parquet DIRECTORY — glob its parts for DuckDB
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    mismatches = {}
    checked = 0
    for name, sql in ORACLES.items():
        n_rows = None
        try:
            sdf = QUERIES[name](spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            atable = con.execute(sql).fetch_arrow_table()
            drows = [tuple(r.values()) for r in atable.to_pylist()]
            dcols = atable.column_names
            checked += 1
            n_rows = len(srows)
            # the gate's full comparison: columns, type classes, counts,
            # then typed values — type drift must fail even when the
            # value level cannot see it (0-row / all-NULL regimes)
            if sorted(scols) != sorted(dcols):
                mismatches[name] = {"columns": [scols, dcols]}
            else:
                sclasses = {
                    f.name: _spark_type_class(f.dataType)
                    for f in sdf.schema.fields
                }
                dclasses = {
                    fld.name: _arrow_type_class(fld.type)
                    for fld in atable.schema
                }
                drift = {
                    c: (sclasses[c], dclasses[c])
                    for c in sclasses
                    if sclasses[c] != dclasses[c]
                }
                if drift:
                    mismatches[name] = {"type_drift": drift}
                elif len(srows) != len(drows):
                    mismatches[name] = {"rows": [len(srows), len(drows)]}
                else:
                    a = _rows_to_set(scols, srows)
                    b = _rows_to_set(dcols, drows)
                    if a != b:
                        diff = [(x, y) for x, y in zip(a, b) if x != y]
                        mismatches[name] = {
                            "first_value_diff": repr(diff[:1])[:300]
                        }
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            mismatches[name] = {"error": str(exc).split("\n")[0][:200]}
        status = "MISMATCH " + next(iter(mismatches[name])) if name in mismatches else "ok"
        rows_note = "" if n_rows is None else f" ({n_rows} rows)"
        print(f"  {name}: {status}{rows_note}", file=sys.stderr)
    print(json.dumps({
        "sf_dir": SF_DIR, "checked": checked,
        "n_mismatches": len(mismatches), "mismatches": mismatches,
    }))


if __name__ == "__main__":
    main()
