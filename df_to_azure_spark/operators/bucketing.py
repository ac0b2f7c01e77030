"""Bucketed tables: pre-shuffled storage so repeated joins/aggs on the
bucket key skip their exchange entirely.

At 100 TB the dominant cost of a fact-fact join is the shuffle; bucketing
both sides by the join key at write time moves that cost to ingestion
(once) instead of every query.  Spark's native bucketing (hash of the
bucket column → fixed file count, ``.sortBy`` within buckets) lets the
planner prove co-partitioning and drop the Exchange under a sort-merge
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (+in-bucket sorted) table in the session
    catalog; ``path`` makes it external."""
    w = df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
