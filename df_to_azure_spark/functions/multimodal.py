"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with Arrow-batched decode/feature plumbing.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features derived from the bytes, or
``NotImplementedError`` for the real path) — but everything Spark-side is
real and tested: the schema, the ``mapInPandas`` batch shape, partition
sizing, and the pattern of keeping heavy binary columns OUT of shuffles
(process then project, join metadata later by id).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: hash the bytes into a
    fixed-dim unit-scale feature vector.  Replace with a real
    image/audio featurizer where the codec libraries exist.

    Derived from the sha256 HEX digits (not raw digest bytes) so the
    whole decode is replicable in plain SQL — the ``media_features``
    registry query is oracle-paired, turning the Arrow/mapInPandas
    plumbing into a hash-checked surface instead of a rows-only one."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    hexd = hashlib.sha256(payload).hexdigest()
    return [int(c, 16) / 15.0 for c in hexd[:FEATURE_DIM]]


def real_decode(payload: bytes, kind: str):  # pragma: no cover - stub
    raise NotImplementedError(
        "media decode requires codec libraries (PIL/ffmpeg) not present in "
        "this environment; wire them here"
    )


def extract_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    ``mapInPandas`` so each Python worker sees a whole Arrow batch of
    payloads (amortized serde), never a row at a time.  The binary column
    is dropped on output — downstream joins carry only ``media_id`` +
    features, keeping shuffles narrow.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "features": pdf["payload"].map(fake_decode_features),
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def synthesize_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests (no codecs needed)."""
    kinds = ["image", "audio", "video"]
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(*[F.lit(k) for k in kinds]), (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        F.create_map(
            F.lit("source"), F.concat(F.lit("synth-"), (F.col("id") % 7).cast("string"))
        ).alias("meta"),
    )
