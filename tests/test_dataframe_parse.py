"""Equivalence of the pure-DataFrame (window-function) parse against
the imperative kernel on the full committed month — proving the
declarative P3/P4/P6 mappings produce identical silver tables."""

from __future__ import annotations

import pytest

from boatrace_database_spark.parse.dataframe_parse import silver_tables_df
from boatrace_database_spark.parse.kernel import parse_txt_files
from boatrace_database_spark.silver import silver_tables
from boatrace_database_spark.sources.bronze import read_txt_lines

GLOB = "/root/reference/txt/*2008*.TXT"


@pytest.fixture(scope="module")
def both(spark):
    bronze = read_txt_lines(spark, GLOB).persist()
    parsed = parse_txt_files(spark, GLOB).persist()
    yield silver_tables_df(bronze), silver_tables(parsed)
    bronze.unpersist()
    parsed.unpersist()


@pytest.mark.parametrize("table", ["schedule", "result", "env", "odds"])
def test_dataframe_parse_equals_kernel(both, table):
    declarative, kernel = both
    a = sorted(tuple(r) for r in declarative[table].collect())
    b = sorted(tuple(r) for r in kernel[table].collect())
    assert len(a) == len(b), f"{table}: {len(a)} vs {len(b)}"
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{table}: first diffs {mismatches[:3]}"
