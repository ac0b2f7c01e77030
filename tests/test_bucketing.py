"""Bucketed-join plan property: two tables bucketed on the join key must
join with NO shuffle exchange (the whole point of bucketing)."""

from __future__ import annotations

import pytest

from df_to_azure_spark.operators.bucketing import read_table, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"),
        "b_orders", "orderkey", buckets=8, path=str(tmp_path / "bo"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"),
        "b_lineitem", "orderkey", buckets=8, path=str(tmp_path / "bl"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = read_table(spark, "b_orders").join(
            read_table(spark, "b_lineitem"), "orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
