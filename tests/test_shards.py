"""Deterministic training-shard export: layout, ordering, and manifest
parity (operators.shards + plans.pipeline4.doc_shard_manifest)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from df_to_azure_spark.functions.sampling import hash_bucket
from df_to_azure_spark.operators.shards import write_training_shards
from df_to_azure_spark.sources import load_table

N_SHARDS = 8


def test_write_training_shards_layout_and_order(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, id_col="doc_id", n_shards=N_SHARDS)

    # one parquet file per shard directory
    dirs = sorted(glob.glob(os.path.join(out, "shard_id=*")))
    assert len(dirs) == N_SHARDS
    for d in dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d} has {len(files)} files"

    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    # every row's directory matches its recomputed md5 bucket
    mismatched = back.where(
        F.col("shard_id").cast("int") != hash_bucket("doc_id", N_SHARDS)
    ).count()
    assert mismatched == 0

    # in-file order within each shard is ascending md5(doc_id): read one
    # shard dir directly (preserves file row order) and compare
    one = spark.read.parquet(dirs[0])
    ids = [r.doc_id for r in one.select("doc_id").collect()]
    hashes = [
        r.h
        for r in one.select(F.md5(F.col("doc_id").cast("string")).alias("h")).collect()
    ]
    assert hashes == sorted(hashes)
    assert len(ids) == len(set(ids))


def test_shard_manifest_matches_written_layout(spark, sf_smoke, tmp_path):
    """The oracle-paired manifest query describes exactly what the writer
    lays down (counts + order fingerprints per shard)."""
    from df_to_azure_spark.plans.pipeline4 import _N_SHARDS, doc_shard_manifest

    docs = load_table(spark, sf_smoke, "documents")
    out = str(tmp_path / "shards16")
    write_training_shards(docs, out, id_col="doc_id", n_shards=_N_SHARDS)

    manifest = {r.shard_id: r for r in doc_shard_manifest(spark, sf_smoke).collect()}
    back = (
        spark.read.parquet(out)
        .select(
            F.col("shard_id").cast("int").alias("shard_id"),
            F.md5(F.col("doc_id").cast("string")).alias("h"),
            "n_chars",
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("h").alias("first_hash"),
            F.max("h").alias("last_hash"),
        )
    )
    for r in back.collect():
        m = manifest[r.shard_id]
        assert (r.n_docs, r.total_chars, r.first_hash, r.last_hash) == (
            m.n_docs,
            m.total_chars,
            m.first_hash,
            m.last_hash,
        )


def test_max_records_per_file_splits_preserve_order(spark, sf_smoke, tmp_path):
    """An oversized shard rolls into multiple sequentially-named files;
    concatenating them in lexical name order must reproduce the full
    md5 ordering (the contract trainers assume)."""
    docs = load_table(spark, sf_smoke, "documents")
    out = str(tmp_path / "split_shards")
    write_training_shards(
        docs, out, id_col="doc_id", n_shards=2, max_records_per_file=10
    )
    dirs = sorted(glob.glob(os.path.join(out, "shard_id=*")))
    assert len(dirs) == 2
    for d in dirs:
        files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        assert len(files) > 1, "expected the shard to split"
        hashes = []
        for fname in files:
            part = spark.read.parquet(os.path.join(d, fname))
            hashes.extend(
                r.h
                for r in part.select(
                    F.md5(F.col("doc_id").cast("string")).alias("h")
                ).collect()
            )
        assert hashes == sorted(hashes), d
