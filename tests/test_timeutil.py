"""normalize_ts: every observed testdata ts encoding coerces to plain
TIMESTAMP with the same wall-clock value (session tz is UTC)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from boatrace_database_spark.timeutil import normalize_ts

US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, microseconds


def _value(df):
    out = normalize_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    return out.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).first()[0]


def test_bigint_nanos_branch(spark):
    df = spark.createDataFrame([(US * 1000,)], "ts LONG")
    assert _value(df) == "2023-11-14 22:13:20.000000"


def test_timestamp_ntz_branch(spark):
    naive = datetime.datetime(2023, 11, 14, 22, 13, 20)
    df = spark.createDataFrame([(naive,)], "ts TIMESTAMP_NTZ")
    assert _value(df) == "2023-11-14 22:13:20.000000"


def test_timestamp_passthrough(spark):
    df = spark.createDataFrame([(US,)], "us LONG").select(
        F.timestamp_micros("us").alias("ts")
    )
    out = normalize_ts(df)
    # already TIMESTAMP: the plan must be unchanged, not re-cast
    assert out is df
    assert _value(df) == "2023-11-14 22:13:20.000000"


def test_missing_column_is_noop(spark):
    df = spark.range(3)
    assert normalize_ts(df) is df


def test_all_encodings_agree_on_the_same_instant(spark):
    naive = datetime.datetime(2023, 11, 14, 22, 13, 20, 123456)
    us = int(naive.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    frames = [
        spark.createDataFrame([(us * 1000,)], "ts LONG"),
        spark.createDataFrame([(naive,)], "ts TIMESTAMP_NTZ"),
        spark.createDataFrame([(us,)], "us LONG").select(
            F.timestamp_micros("us").alias("ts")
        ),
    ]
    vals = {_value(df) for df in frames}
    assert vals == {"2023-11-14 22:13:20.123456"}
