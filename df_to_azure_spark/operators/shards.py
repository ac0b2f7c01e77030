"""Deterministic training-shard export.

The last step of every LLM data pipeline: lay the curated corpus out as
N shards in a stable pseudo-random order so a trainer can stream them
reproducibly.  RNG shuffles are neither stable across runs nor derivable
per-row at 100 TB; hashing is both — shard = ``first16bits(md5(id)) % N``
and within-shard order = the full md5 (see ``functions.sampling`` for the
policy, and ``plans.pipeline4.doc_shard_manifest`` for the oracle-paired
manifest of the same layout).

Scale shape: one hash-repartition on the shard id (each shard's rows land
wholly in one task), a task-local sort, and a partitioned parquet write —
exactly one file per shard directory, no window, no driver collect.  On a
real cluster ``maxRecordsPerFile`` splits oversized shards without
breaking the order (files sort lexically within the dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from df_to_azure_spark.functions.sampling import hash_bucket

SHARD_COL = "shard_id"
ORDER_COL = "__shard_order"


def with_shard(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Append the deterministic shard id and within-shard order hash."""
    return df.withColumn(SHARD_COL, hash_bucket(id_col, n_shards)).withColumn(
        ORDER_COL, F.md5(F.col(id_col).cast("string"))
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as ``path/shard_id=K/`` parquet dirs, one file per
    shard, rows md5-ordered within each shard.

    ``repartition(n, shard)`` routes every row of a shard to a single
    task (two shards may share a task — each still writes its own
    directory, so one file per shard holds); ``sortWithinPartitions``
    fixes the in-file order without a global sort.

    ``max_records_per_file`` bounds individual file size for oversized
    shards (the 100 TB case): the task rolls to a new sequentially-named
    part file every N rows, so the shard's md5 order is preserved by
    reading its files in lexical name order — the contract trainers
    already assume for sharded datasets.
    """
    sharded = with_shard(df, id_col, n_shards)
    writer = (
        sharded.repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, ORDER_COL)
        .drop(ORDER_COL)
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.partitionBy(SHARD_COL).parquet(path)
