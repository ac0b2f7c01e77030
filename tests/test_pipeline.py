"""Corpus-prep pipeline invariants that the oracle pairing can't express:
chunk reconstruction, contamination symmetry."""

from __future__ import annotations

from pyspark.sql import functions as F

from df_to_azure_spark.plans import pipeline as PL
from df_to_azure_spark.plans.training_data import doc_split_counts


def test_chunks_cover_all_tokens(spark, sf_smoke):
    """Every token of every document appears in at least one chunk, and
    consecutive chunks overlap by chunk-stride tokens."""
    chunks = PL.doc_chunks(spark, sf_smoke)
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    one = docs.orderBy("doc_id").limit(1).collect()[0]
    toks = one.text.split()
    got = (
        chunks.where(F.col("doc_id") == one.doc_id)
        .orderBy("chunk_id")
        .collect()
    )
    # first chunk starts at token 0; windows advance by stride 24
    assert got[0].chunk_text.split() == toks[:32]
    for r in got:
        start = r.chunk_id * 24
        assert r.chunk_text.split() == toks[start : start + 32]
    last = got[-1]
    assert last.chunk_id * 24 + last.chunk_tokens >= len(toks)  # full coverage


def test_contamination_pairs_are_cross_split_dups(spark, sf_smoke):
    rows = PL.split_contamination(spark, sf_smoke).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_smoke}/documents.parquet").collect()
    }
    for r in rows:
        assert docs[r.heldout_doc] == docs[r.train_doc]
        assert r.heldout_doc != r.train_doc


def test_training_mix_counts_are_consistent(spark, sf_smoke):
    mix = PL.training_mix(spark, sf_smoke).collect()
    assert all(r.n_docs > 0 for r in mix)
    splits = {r.split for r in mix}
    assert splits <= {"train", "val", "test"}
    # the mix is a subset of the raw split counts (filter + dedup shrink)
    raw = {
        (r.split,): r.n_docs for r in doc_split_counts(spark, sf_smoke).collect()
    }
    per_split = {}
    for r in mix:
        per_split[r.split] = per_split.get(r.split, 0) + r.n_docs
    for split, n in per_split.items():
        assert n <= raw[(split,)]
