"""Parallelism guards.

``spread(df)``: widen an under-partitioned DataFrame to the cluster's
default parallelism.  The local bench data arrives as single-row-group
parquet files — one scan partition — which serializes any compute-heavy
map stage onto one core; a real 100 TB table arrives in thousands of
splits and passes through untouched (the condition, not the shuffle, is
the point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
