"""Multimodal plumbing: schema, Arrow batch shape, deterministic stub."""

from __future__ import annotations

import pytest

from df_to_azure_spark.functions import multimodal as MM


def test_synthesized_media_schema(spark):
    df = MM.synthesize_media(spark, n=30)
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in MM.MEDIA_SCHEMA.fields
    ]
    kinds = {r.kind for r in df.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_shape_and_determinism(spark):
    df = MM.synthesize_media(spark, n=30)
    out1 = {r.media_id: r.features for r in MM.extract_features(df).collect()}
    out2 = {r.media_id: r.features for r in MM.extract_features(df).collect()}
    assert out1 == out2  # deterministic across runs
    assert all(len(v) == MM.FEATURE_DIM for v in out1.values())
    assert all(0.0 <= x <= 1.0 for v in out1.values() for x in v)


def test_features_drop_payload_column(spark):
    out = MM.extract_features(MM.synthesize_media(spark, n=5))
    assert "payload" not in out.columns  # binary stays out of downstream shuffles


def test_n_bytes_counted(spark):
    out = MM.extract_features(MM.synthesize_media(spark, n=5)).collect()
    assert all(r.n_bytes == 64 for r in out)  # sha2-256 hex utf8 = 64 bytes


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.real_decode(b"x", "image")
