"""Text-analysis operator semantics."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from df_to_azure_spark.functions import text as TXT


def test_token_count_and_empties(spark):
    df = spark.createDataFrame(
        [("a b  c ",), ("",), ("   ",), ("single",)], "text string"
    )
    out = [r[0] for r in df.select(TXT.token_count("text")).collect()]
    assert out == [3, 0, 0, 1]


def test_stopword_count(spark):
    df = spark.createDataFrame([("the cat and the dog",)], "text string")
    assert df.select(TXT.stopword_count("text")).collect()[0][0] == 3


def test_avg_token_length(spark):
    df = spark.createDataFrame([("ab abcd",)], "text string")
    assert df.select(TXT.avg_token_length("text")).collect()[0][0] == 3.0


def test_language_id_markers_and_priority(spark):
    df = spark.createDataFrame(
        [("the cat and dog",), ("der hund und das",), ("xyz qrs",), ("the und",)],
        "text string",
    )
    out = [r[0] for r in df.select(TXT.language_id("text")).collect()]
    # last row: en and de tie at 1 marker each → priority picks en
    assert out == ["en", "de", "unknown", "en"]


def test_fingerprint_is_md5(spark):
    df = spark.createDataFrame([("hello",)], "text string")
    fp = df.select(TXT.fingerprint("text")).collect()[0][0]
    assert fp == hashlib.md5(b"hello").hexdigest()


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    out = [r[0] for r in df.select(TXT.shingles("text", 3)).collect()]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == ["a b"]  # shorter than n → whole text as one shingle


def test_with_text_stats_runs_on_real_docs(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    out = TXT.with_text_stats(docs)
    row = out.orderBy("doc_id").limit(1).collect()[0]
    assert row.n_tokens > 0
    assert row.n_chars_computed == row.n_chars  # driver precomputed length
    assert 0.0 <= row.quality <= 1.0
