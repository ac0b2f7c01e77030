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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) left side's key
    into ``salt_buckets`` sub-keys and replicate the right side across
    every salt value, so one hot key spreads over ``salt_buckets`` tasks
    instead of melting a single reducer.

    AQE's skew-join split (enabled in the session defaults) handles most
    skew automatically; explicit salting is for the cases AQE can't see —
    a skewed aggregation feeding the join, or deterministic layout needs.
    Result is row-identical to ``left.join(right, on, how)`` for the
    supported join types.  Right/full-outer joins are rejected: the right
    side is replicated ``salt_buckets`` times, so every unmatched right
    row would surface once per replica.
    """
    from pyspark.sql import functions as F

    supported = {"inner", "left", "left_outer", "leftouter", "left_semi",
                 "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in supported:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated right "
            "side would duplicate unmatched right rows; use AQE skew-join "
            "for right/full outer joins"
        )

    salted_l = left.withColumn(
        "__salt", (F.xxhash64(F.monotonically_increasing_id()) % salt_buckets).cast("int")
    ).withColumn("__salt", F.abs(F.col("__salt")))
    replicated_r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_l.join(replicated_r, on=[on, "__salt"], how=how)
    return out.drop("__salt")
