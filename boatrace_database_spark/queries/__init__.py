"""Query catalog: every SURVEY §2 operator demonstrated on the driver's
star schema, each with a DuckDB oracle SQL (where SQL-expressible).

Registry contract (driver __spark_entry__.py):
- ``QUERIES[name]``   : (spark, sf_dir) -> DataFrame
- ``ORACLES[name]``   : ANSI SQL string DuckDB runs on the same tables,
                        or absent for non-SQL-expressible operators
                        (the driver then records a rows-only check).

Column names are aliased identically on both sides; float aggregates
are rounded identically on both sides so order-of-summation noise
cannot flip the driver's value hash.
"""

from __future__ import annotations

from boatrace_database_spark.queries import advanced, analytics, llm, relational

QUERIES = {}
ORACLES = {}
for mod in (relational, analytics, advanced, llm):
    QUERIES.update(mod.QUERIES)
    ORACLES.update({k: v for k, v in mod.ORACLES.items() if v is not None})
