"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001;
``queries()``/``oracle_sql()`` expose the full operator catalog
(boatrace_database_spark.queries) for the DuckDB-oracle correctness
gate at sf0.01. Operators whose implementation is hash-based
(MinHash/SimHash/LSH-ANN/xxhash fingerprints) have no SQL oracle —
the driver records rows-only checks; pytest covers their correctness
against exact counterparts (tests/test_llm_ops.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from boatrace_database_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ north-star
    LLM-pipeline operators). Callables take (spark, sf_dir)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (column names match exactly)."""
    return dict(ORACLES)
