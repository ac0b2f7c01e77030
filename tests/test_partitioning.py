"""spread() and salted_join() semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from df_to_azure_spark.operators.partitioning import salted_join, spread


def test_spread_widens_and_passes_through(spark):
    narrow = spark.range(1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    widened = spread(narrow)
    assert widened.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert widened.count() == 1000
    wide = spark.range(10).repartition(64)
    assert spread(wide) is wide


def test_salted_join_matches_plain_join(spark):
    # heavily skewed left: 90% of rows share key 7
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame([(7, "hot"), (0, "a"), (10, "b")], ["k", "v"])
    plain = left.join(right, "k").select("k", "payload", "v")
    salted = salted_join(left, right, "k").select("k", "payload", "v")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(spark):
    left = spark.range(5000).select(F.lit(1).alias("k"), F.col("id").alias("p"))
    right = spark.createDataFrame([(1, "x")], ["k", "v"])
    out = salted_join(left, right, "k", salt_buckets=8)
    assert out.count() == 5000
