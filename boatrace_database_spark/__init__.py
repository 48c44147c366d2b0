"""boatrace_database_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the
reference ETL (`tyPhoon-collab/boatrace-database`, snapshot at
/root/reference) as an idiomatic Spark DataFrame/SQL engine:

- bronze: raw archive bytes -> CP932-decoded tagged lines
- silver: typed relational tables (schedule / result / odds / env)
- gold:   the denormalized ``race`` table + analytics (A1-A4)
- plus large-scale training-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing) designed
  for 100 TB / multi-executor scale.

Everything is declarative DataFrame logic so Catalyst handles
pushdown, pruning, join strategy and AQE; the only imperative kernel
is the per-file fixed-layout parser (Arrow-vectorized mapInPandas).
"""

from boatrace_database_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
