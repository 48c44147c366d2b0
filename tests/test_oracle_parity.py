"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count + schema + order-insensitive values (columns sorted by name,
rows sorted, exact equality after canonicalization).

Stricter than the driver in one way: we compare actual values, not a
hash, so failures print the first differing rows.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and float noise at the 9th decimal
        return round(v, 9) + 0.0
    if isinstance(v, int):
        return v
    return v


def _rows_to_set(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


ALL_QUERIES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(name, spark, ddb):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        # rows-only check, like the driver's weaker gate
        assert len(spark_rows) >= 0
        return

    res = ddb.execute(oracle)
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), (
        f"{name}: column mismatch {spark_cols} vs {ddb_cols}"
    )
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(ddb_rows)}"
    )
    a = _rows_to_set(spark_cols, [tuple(r) for r in spark_rows])
    b = _rows_to_set(ddb_cols, ddb_rows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first diffs {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns


def test_contract_invariants():
    """Driver-contract hygiene: every oracle key maps to a query, SQL
    strings are non-empty, and the module imports without a session."""
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(isinstance(v, str) and v.strip() for v in os_.values())
    assert len(qs) >= 60
