"""Event-time normalization shared by every ts-consuming entry point.

The driver's testdata has flipped ts encodings between rounds
(TIMESTAMP(NANOS) read as ``bigint`` under
``spark.sql.legacy.parquet.nanosAsLong``, then ``timestamp[us]`` read as
``timestamp_ntz``). Batch operators tolerate NTZ but
``withWatermark`` rejects it outright
([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]), so every consumer funnels
through this one helper — the next encoding drift breaks exactly one
function (and one parametrized test) instead of N hand-rolled checks.

The session timezone is pinned to UTC (session.py), so the NTZ →
TIMESTAMP cast preserves the wall-clock value and rendering stays
byte-identical to the UTC-naive DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce an event-time column to plain TIMESTAMP (tz-aware).

    Handles the three encodings observed in the wild:

    - ``bigint``        — epoch nanos-as-long (legacy parquet NANOS read);
                          integer-divide to micros. Sub-microsecond ties
                          are broken by id columns in every catalog query.
    - ``timestamp_ntz`` — parquet ``timestamp[us]`` without a zone;
                          cast interprets the wall clock in the session
                          zone (UTC), value-preserving.
    - ``timestamp``     — already the watermark-compatible type; no-op.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df
