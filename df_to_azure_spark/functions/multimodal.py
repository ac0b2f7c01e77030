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


def available_codecs() -> dict[str, bool]:
    """Probe optional codec libraries per media kind.  The real decode
    path activates exactly for the kinds whose library imports; the
    ``NotImplementedError`` below is reserved for a genuinely absent
    codec, never a wiring gap."""
    codecs = {"image": False, "audio": False, "video": False}
    try:
        from PIL import Image  # noqa: F401

        codecs["image"] = True
    except ImportError:
        pass
    try:
        import wave  # noqa: F401  (stdlib, but keep the probe uniform)

        codecs["audio"] = True
    except ImportError:
        pass
    # video needs an ffmpeg binding (imageio-ffmpeg / av); none in stdlib
    for mod in ("av", "imageio_ffmpeg"):
        try:
            __import__(mod)
            codecs["video"] = True
            break
        except ImportError:
            pass
    return codecs


def real_decode_features(payload: bytes, kind: str) -> list[float]:
    """Real decode → fixed-dim features, per kind:

    - image: PIL decode, grayscale, resize to 4×4, the 16 pixel
      intensities scaled to [0, 1] — a deterministic thumbnail signature;
    - audio: WAV via stdlib ``wave``; 16 per-segment mean |amplitude|
      values scaled to [0, 1];
    - video: frame-sample via an ffmpeg binding when installed.

    Raises ``NotImplementedError`` only when the codec for ``kind`` is
    genuinely absent from the environment (see ``available_codecs``)."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    codecs = available_codecs()
    if kind == "image" and codecs["image"]:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
        return [px / 255.0 for px in img.getdata()]
    if kind == "audio" and codecs["audio"]:
        import io
        import struct
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if width == 2:
            samples = struct.unpack(f"<{len(raw) // 2}h", raw)
            full = 32768.0
        else:  # 8-bit unsigned WAV
            samples = [b - 128 for b in raw]
            full = 128.0
        if not samples:
            return [0.0] * FEATURE_DIM
        seg = max(1, len(samples) // FEATURE_DIM)
        feats = [
            sum(abs(s) for s in samples[i * seg : (i + 1) * seg])
            / (full * max(1, len(samples[i * seg : (i + 1) * seg])))
            for i in range(FEATURE_DIM)
        ]
        return feats
    if kind == "video" and codecs["video"]:
        return _video_frame_features(payload)
    raise NotImplementedError(
        f"no codec available for kind={kind!r} in this environment "
        f"(probed: {codecs}); install PIL (image) or av/imageio-ffmpeg "
        "(video) to enable"
    )


def _video_frame_features(payload: bytes) -> list[float]:
    """Frame-sampled video signature: decode the stream, take the mean
    intensity of each frame (grayscale, scaled to [0, 1]), then sample
    ``FEATURE_DIM`` frames evenly across the sequence; videos shorter
    than ``FEATURE_DIM`` frames use every frame and pad with 0.0.

    Backend: prefers ``av`` (decodes straight from the bytes); falls
    back to ``imageio-ffmpeg``, which needs a file path, so the payload
    spills to a temp file for the duration of the decode.  Only called
    when ``available_codecs()['video']`` is True, so one of the two
    imports is guaranteed to succeed."""
    import io

    means: list[float] = []
    try:
        import av
    except ImportError:
        av = None
    if av is not None:
        with av.open(io.BytesIO(payload)) as container:
            for frame in container.decode(video=0):
                arr = frame.to_ndarray(format="gray")
                # arr is a uint8 HxW array; plain-python mean keeps the
                # helper importable without numpy
                total = sum(int(v) for row in arr.tolist() for v in row)
                means.append(total / (255.0 * arr.size))
    else:
        import os
        import tempfile

        import imageio_ffmpeg

        fd, path = tempfile.mkstemp(suffix=".video")
        try:
            with os.fdopen(fd, "wb") as tmp:
                tmp.write(payload)
            gen = imageio_ffmpeg.read_frames(path)
            next(gen)  # metadata dict
            for raw in gen:  # rgb24 bytes per frame
                if len(raw):
                    means.append(sum(raw) / (255.0 * len(raw)))
        finally:
            os.unlink(path)
    if not means:
        return [0.0] * FEATURE_DIM
    if len(means) >= FEATURE_DIM:
        return [
            means[i * len(means) // FEATURE_DIM] for i in range(FEATURE_DIM)
        ]
    return means + [0.0] * (FEATURE_DIM - len(means))


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    ``mapInPandas`` so each Python worker sees a whole Arrow batch of
    payloads (amortized serde), never a row at a time.  The binary column
    is dropped on output — downstream joins carry only ``media_id`` +
    features, keeping shuffles narrow.

    ``decoder="fake"`` (default) uses the deterministic SQL-replicable
    hash features, keeping the query oracle-checkable in codec-less
    environments; ``decoder="real"`` decodes with the probed codec
    libraries and raises per-row only for kinds with no codec installed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                feats = [
                    real_decode_features(p, k)
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ]
            else:
                feats = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "features": feats,
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


FRAME_MANIFEST_SCHEMA = (
    "media_id long, frame_idx int, byte_offset int, window_sha string"
)


def sample_frames(df: DataFrame, k: int = 4, window: int = 16) -> DataFrame:
    """Deterministic frame-sampling manifest over media payloads via
    Arrow-batched ``mapInPandas``: ``k`` byte offsets evenly spaced over
    each payload (``j·(len−window)//(k−1)``) and the sha256 of each
    ``window``-byte slice as the frame fingerprint.

    This is the SAMPLING side of a video pipeline with the decode
    swapped for a byte-window fingerprint: the production artifact —
    a (media_id, frame_idx, offset, fingerprint) manifest that dedup and
    retrieval join on — has exactly this schema whether the fingerprint
    comes from pixels or payload bytes, and the Spark-side plumbing
    (Arrow batch shape, binary column dropped from the output so
    shuffles stay narrow) is identical.  Deterministic offsets keep the
    whole lane SQL-replicable, the same contract as
    ``extract_features``'s fake decoder."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "frame_idx": [],
                "byte_offset": [],
                "window_sha": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) < window:
                    continue
                n = len(payload)
                for j in range(k):
                    off = j * (n - window) // (k - 1) if k > 1 else 0
                    out["media_id"].append(mid)
                    out["frame_idx"].append(j)
                    out["byte_offset"].append(off)
                    out["window_sha"].append(
                        hashlib.sha256(payload[off : off + window]).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAME_MANIFEST_SCHEMA)
