"""End-to-end ANN index workflow: encode corpus -> persist the PQ codes
table to the lake -> read it back -> search from the stored index.  The
stored-index search must return exactly what the direct (encode-inline)
search returns — the contract that lets a user build the index once and
query it from any later session."""

from __future__ import annotations

from pyspark.sql import functions as F

from df_to_azure_spark.functions.similarity import (
    pq_adc_topk,
    pq_adc_topk_from_codes,
    pq_codes,
    sample_codebooks,
)
from df_to_azure_spark.operators.lake import ParquetLake


def test_pq_index_lake_round_trip(spark, sf_smoke, tmp_path):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    books = sample_codebooks(emb, m=4, k=8)
    queries = emb.where(F.col("vec_id") < 3)

    direct = pq_adc_topk(queries, emb, books, k=5)

    lake = ParquetLake(spark, str(tmp_path))
    codes = pq_codes(emb, books).withColumnRenamed("vec_id", "neighbor_id")
    lake.create(codes, "pq_index")
    stored = lake.read("pq_index")
    via_index = pq_adc_topk_from_codes(queries, stored, books, k=5)

    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_pq_from_codes_validates_layout(spark, sf_smoke):
    import pytest

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    books = sample_codebooks(emb, m=4, k=8)
    bad = emb.select(F.col("vec_id").alias("neighbor_id"))  # no code cols
    with pytest.raises(ValueError, match="lacks"):
        pq_adc_topk_from_codes(emb.where("vec_id < 3"), bad, books)
