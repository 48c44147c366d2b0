"""Physical-plan assertions: the scale properties are checked, not
assumed — filter pushdown reaches the parquet scan, column pruning
trims ReadSchema, dimension joins broadcast, aggregates run map-side
partials, and bucketed tables join without a shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from boatrace_database_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def _plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q1_pushdown_and_pruning(spark):
    plan = _plan(spark, QUERIES["q1_pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning: only the 7 needed columns reach the scan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    # map-side partial aggregation before the shuffle
    df = QUERIES["q1_pricing_summary"](spark, SF)
    simple = df._jdf.queryExecution().simpleString()
    assert "partial_sum" in simple
    # whole-stage codegen spans (*(n)) appear once THIS plan executes
    # (count() would build a different plan; collect finalizes this one)
    df.collect()
    assert "*(" in df._jdf.queryExecution().executedPlan().toString()


def test_q5_broadcasts_dimensions(spark):
    plan = _plan(spark, QUERIES["q5_region_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # everything fits broadcast at this SF


def test_topk_uses_limit_pushdown(spark):
    plan = _plan(spark, QUERIES["topk_orders"](spark, SF))
    assert "TakeOrderedAndProject" in plan  # top-k, not global sort


def test_semi_join_stays_semi(spark):
    plan = _plan(spark, QUERIES["semi_join"](spark, SF))
    assert "LeftSemi" in plan


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key co-locates partitions: the
    join plan must contain no Exchange (the 100 TB co-located-join
    strategy, SURVEY §1.3/§7 M8)."""
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    (
        o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", str(tmp_path / "orders_b")).saveAsTable("orders_b")
    )
    (
        c.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", str(tmp_path / "customer_b")).saveAsTable("customer_b")
    )
    joined = spark.table("orders_b").join(
        spark.table("customer_b").hint("merge"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    plan = _plan(spark, joined)
    assert "Exchange" not in plan, plan
    assert joined.count() == o.join(c, o.o_custkey == c.c_custkey).count()
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_race_join_is_shuffle_free(spark):
    """The gold race join: AQE converts both joins to broadcast-hash —
    zero shuffle exchanges in the final plan."""
    from boatrace_database_spark.gold import race_table
    from boatrace_database_spark.parse.kernel import parse_txt_files
    from boatrace_database_spark.silver import silver_tables

    parsed = parse_txt_files(spark, "/root/reference/txt/*200801.TXT").persist()
    t = silver_tables(parsed)
    race = race_table(t["result"], t["env"], t["schedule"])
    race.count()  # let AQE finalize
    final = race._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final
    assert "ShuffleExchange" not in final
    parsed.unpersist()
