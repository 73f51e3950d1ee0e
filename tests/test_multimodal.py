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
    # the fixture payloads are NOT valid PNG/WAV (truncated magic), so under
    # strict=True the per-row dispatch must refuse to fake features
    with pytest.raises(Exception, match="no codec"):
        extract_media_features(media, strict=True).collect()


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


def _real_png(width=5, height=3):
    """A fully valid PNG built with stdlib only (zlib + crc32): IHDR, one
    IDAT of grayscale scanlines, IEND."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(range(width)) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _real_wav(n_frames=800, rate=8000, amp=1000):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack("<h", int(amp * math.sin(2 * math.pi * 440 * i / rate)))
            for i in range(n_frames)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_real_stdlib_decoders(spark):
    """VERDICT-r3 item 6: real payloads decode through the stdlib codecs —
    actual dimensions out of a real PNG, actual rate/duration/RMS out of a
    real WAV — while an undecodable payload still uses the stub."""
    rows = [
        ("png1", bytearray(_real_png(5, 3)), None),
        ("wav1", bytearray(_real_wav(800, 8000)), None),
        ("mp41", bytearray(b"\x00\x00\x00\x18ftypmp42"), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id string, payload binary, "
        "meta struct<mime:string, width:int, height:int, duration_ms:int>",
    )
    by_id = {r["media_id"]: r for r in extract_media_features(media).collect()}
    png = by_id["png1"]
    assert png["decoder"] == "png"
    assert png["feature"][:5] == [1.0, 5.0, 3.0, 8.0, 0.0]  # w, h, depth, gray
    wav = by_id["wav1"]
    assert wav["decoder"] == "wav"
    kind, nch, rate, frames, dur, sw, rms = wav["feature"][:7]
    assert (kind, nch, rate, frames, sw) == (2.0, 1.0, 8000.0, 800.0, 2.0)
    assert abs(dur - 0.1) < 1e-6
    assert 600 < rms < 800  # sine at amp 1000 -> rms ~ 707
    assert by_id["mp41"]["decoder"] == "stub"


def test_strict_passes_on_real_payloads(spark):
    media = spark.createDataFrame(
        [("p", bytearray(_real_png()), None)],
        "media_id string, payload binary, "
        "meta struct<mime:string, width:int, height:int, duration_ms:int>",
    )
    out = extract_media_features(media, strict=True).collect()
    assert out[0]["decoder"] == "png"


def _real_jpeg(width=7, height=4, progressive=False):
    """A minimal structurally-valid JPEG prefix built with stdlib only:
    SOI, APP0/JFIF, a DQT, then SOF0 (baseline) or SOF2 (progressive)
    carrying the frame dimensions — exactly the walk decode_jpeg performs;
    a real file would continue with DHT/SOS/entropy data."""
    import struct

    def seg(marker, data):
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(64)
    sof = struct.pack(">BHHB", 8, height, width, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return (
        b"\xff\xd8"
        + seg(0xE0, app0)
        + seg(0xDB, dqt)
        + seg(0xC2 if progressive else 0xC0, sof)
    )


def test_real_jpeg_decoder(spark):
    """VERDICT-r4 item 4: real width/height from real JPEG bytes — baseline
    (SOF0) and progressive (SOF2); truncated / SOF-less payloads refuse."""
    from predicate_finder_spark.operators.multimodal import decode_jpeg

    assert decode_jpeg(_real_jpeg(7, 4)) == [3.0, 7.0, 4.0, 8.0, 3.0, 0.0, 0.0, 0.0]
    assert decode_jpeg(_real_jpeg(640, 480, progressive=True))[:6] == [
        3.0, 640.0, 480.0, 8.0, 3.0, 1.0,
    ]
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None  # SOI+EOI, no frame
    assert decode_jpeg(b"\xff\xd8") is None
    assert decode_jpeg(b"RIFFnotjpeg") is None
    rows = [
        ("j1", bytearray(_real_jpeg(7, 4)), None),
        ("j2", bytearray(_real_jpeg(640, 480, progressive=True)), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id string, payload binary, "
        "meta struct<mime:string, width:int, height:int, duration_ms:int>",
    )
    by_id = {
        r["media_id"]: r
        for r in extract_media_features(media, strict=True).collect()
    }
    assert by_id["j1"]["decoder"] == "jpeg"
    assert by_id["j1"]["feature"][:3] == [3.0, 7.0, 4.0]
    assert by_id["j2"]["feature"][1:3] == [640.0, 480.0]
