"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns travelling next to typed
metadata structs; the decode/feature kernels run as Arrow-batched pandas
UDFs over mapInPandas.  The image/audio codec libraries are not in this
container, so the decode step is STUBBED: ``decode_fn=None`` uses a
deterministic fake (md5-derived features) and ``strict=True`` raises
NotImplementedError — the Spark-side schema, batching, and partition shape
are real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURES_SCHEMA = "media_id string, n_bytes long, feature array<float>, decoder string"


def _fake_features(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-derived unit-ish
    vector — stable per payload, so tests can assert exact values."""
    h = hashlib.md5(payload or b"").digest()
    return [((h[i % 16] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def extract_media_features(
    media: DataFrame,
    decode_fn=None,
    strict: bool = False,
    dim: int = 8,
) -> DataFrame:
    """media(media_id, payload, meta) -> (media_id, n_bytes, feature, decoder).

    ``decode_fn: bytes -> list[float]`` plugs in a real decoder (PIL /
    torchaudio / ffmpeg) when available; the batch shape (mapInPandas over
    Arrow record batches) is identical either way, so swapping the stub for
    a real codec changes zero Spark plumbing.
    """
    if strict and decode_fn is None:
        raise NotImplementedError(
            "No media codec in this environment; pass decode_fn or strict=False"
        )
    fn = decode_fn or (lambda b: _fake_features(b, dim))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "feature": payloads.map(lambda b: fn(bytes(b) if b is not None else b"")),
                    "decoder": "stub" if decode_fn is None else getattr(decode_fn, "__name__", "custom"),
                }
            )

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (explode over the sequence of sample points from meta.duration_ms).
    The actual frame decode would run in extract_media_features over the
    exploded rows — the explode is the real Spark-side work and is tested."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("sample_ms"),
    )
