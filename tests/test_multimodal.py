"""Multimodal plumbing: schema, Arrow batching, frame-sample explode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from predicate_finder_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", bytearray(b"\x89PNGfakebytes"), ("image/png", 64, 48, None)),
        ("m2", bytearray(b"RIFFfakewav"), ("audio/wav", None, None, 2500)),
        ("m3", None, ("video/mp4", 320, 240, 3500)),
    ]
    return spark.createDataFrame(
        rows,
        "media_id string, payload binary, "
        "meta struct<mime:string, width:int, height:int, duration_ms:int>",
    )


def test_feature_extraction_stub(media):
    out = extract_media_features(media).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id["m1"]["n_bytes"] == 13 and len(by_id["m1"]["feature"]) == 8
    assert by_id["m3"]["n_bytes"] == 0
    assert all(r["decoder"] == "stub" for r in out)


def test_feature_extraction_deterministic(media):
    a = {r["media_id"]: r["feature"] for r in extract_media_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_media_features(media.repartition(3)).collect()}
    assert a == b


def test_strict_without_decoder_raises(media):
    with pytest.raises(NotImplementedError):
        extract_media_features(media, strict=True)


def test_custom_decoder_plugs_in(media):
    def const2(_b):
        return [1.0, 2.0]

    out = extract_media_features(media, decode_fn=const2).collect()
    assert all(r["feature"] == [1.0, 2.0] for r in out)
    assert all(r["decoder"] == "const2" for r in out)


def test_frame_sample_plan(media):
    got = frame_sample_plan(media, every_ms=1000).collect()
    ms = sorted(r["sample_ms"] for r in got if r["media_id"] == "m3")
    assert ms == [0, 1000, 2000, 3000]
