"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns travelling next to typed
metadata structs; the decode/feature kernels run as Arrow-batched pandas
UDFs over mapInPandas.  Three REAL stdlib decoders ship in-repo —
:func:`decode_png` (signature + IHDR parse: width/height/bit-depth/
color-type), :func:`decode_wav` (``wave`` module: channels/rate/frames/
duration + PCM RMS over a bounded frame prefix), and :func:`decode_jpeg`
(SOF marker walk: width/height/precision/components for baseline AND
progressive JPEGs) — dispatched by magic bytes in :func:`stdlib_decode`.
Formats with no stdlib codec (MP4/video, …) still fall to the
deterministic md5 stand-in (``decode_fn=None`` + ``strict=False``);
``strict=True`` raises NotImplementedError for them — the Spark-side
schema, batching, and partition shape are identical either way.
"""

from __future__ import annotations

import hashlib
import io
import struct
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> list[float] | None:
    """Real PNG header decode, stdlib-only: validate the 8-byte signature,
    require the first chunk to be IHDR (mandatory per the PNG spec), and
    read width/height/bit-depth/color-type from it.  Returns
    [kind=1, width, height, bit_depth, color_type, interlace, 0, 0] or
    None when the payload is not a PNG."""
    if payload is None or len(payload) < 33 or not payload.startswith(_PNG_SIG):
        return None
    length, ctype = struct.unpack(">I4s", payload[8:16])
    if ctype != b"IHDR" or length != 13:
        return None
    width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", payload[16:29]
    )
    return [1.0, float(width), float(height), float(bit_depth),
            float(color_type), float(interlace), 0.0, 0.0]


def decode_wav(payload: bytes, max_frames: int = 4096) -> list[float] | None:
    """Real WAV decode via the stdlib ``wave`` module: channel count, sample
    rate, frame count, duration, sample width, plus PCM RMS computed over a
    bounded prefix of ``max_frames`` frames (bounded work per row — a
    100 TB corpus cannot afford full-file RMS in the feature pass).
    Returns [kind=2, channels, rate, frames, duration_s, sampwidth, rms, 0]
    or None when the payload is not a RIFF/WAVE file."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        with wave_open(payload) as w:
            nch, sw, rate, nframes = (
                w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
            )
            raw = w.readframes(min(nframes, max_frames))
    except Exception:
        return None
    rms = 0.0
    if sw == 2 and raw:
        samples = struct.unpack(f"<{len(raw) // 2}h", raw)
        rms = (sum(s * s for s in samples) / len(samples)) ** 0.5 if samples else 0.0
    dur = nframes / rate if rate else 0.0
    return [2.0, float(nch), float(rate), float(nframes), float(dur),
            float(sw), float(rms), 0.0]


def wave_open(payload: bytes):
    import wave

    return wave.open(io.BytesIO(payload), "rb")


_JPEG_SOI = b"\xff\xd8"
# SOF markers carrying frame dimensions: C0-CF minus the non-frame C4 (DHT),
# C8 (JPG extension) and CC (DAC)
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def decode_jpeg(payload: bytes) -> list[float] | None:
    """Real JPEG dimension decode, stdlib-only: walk the marker segments
    from SOI to the first SOF frame header (JPEG/JFIF ISO 10918-1 B.2) and
    read precision/height/width/components from it.  Handles the dominant
    web cases — baseline SOF0 and progressive SOF2 — plus every other SOF
    variant, since the frame-header layout is shared.  Returns
    [kind=3, width, height, precision, n_components, progressive, 0, 0]
    or None when the payload is not a JPEG / carries no frame header."""
    if payload is None or len(payload) < 4 or not payload.startswith(_JPEG_SOI):
        return None
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn: standalone
            i += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            if i + 4 + 6 > n or seg_len < 8:
                return None
            precision = payload[i + 4]
            height = int.from_bytes(payload[i + 5 : i + 7], "big")
            width = int.from_bytes(payload[i + 7 : i + 9], "big")
            n_comp = payload[i + 9]
            return [3.0, float(width), float(height), float(precision),
                    float(n_comp), 1.0 if marker == 0xC2 else 0.0, 0.0, 0.0]
        i += 2 + seg_len
    return None


def stdlib_decode(payload: bytes) -> list[float] | None:
    """Magic-byte dispatch over the in-repo stdlib decoders (PNG, WAV,
    JPEG).  None means 'no codec for this format here' —
    extract_media_features then falls back to the md5 stand-in (or raises
    under strict=True)."""
    return decode_png(payload) or decode_wav(payload) or decode_jpeg(payload)


def extract_media_features(
    media: DataFrame,
    decode_fn=None,
    strict: bool = False,
    dim: int = 8,
) -> DataFrame:
    """media(media_id, payload, meta) -> (media_id, n_bytes, feature, decoder).

    Decode order per row: ``decode_fn`` (a custom codec: PIL / torchaudio /
    ffmpeg) when given, else the in-repo :func:`stdlib_decode` (real PNG +
    WAV parsing).  A row neither can decode falls back to the deterministic
    md5 stand-in (``decoder='stub'``) — or raises NotImplementedError under
    ``strict=True`` (no silent fakes in strict pipelines).  The batch shape
    (mapInPandas over Arrow record batches) is identical in every case, so
    swapping codecs changes zero Spark plumbing.
    """
    custom_name = getattr(decode_fn, "__name__", "custom") if decode_fn else None

    def _decode_one(b) -> tuple[list[float], str]:
        payload = bytes(b) if b is not None else b""
        if decode_fn is not None:
            out = decode_fn(payload)
            if out is not None:
                return list(out), custom_name
        out = stdlib_decode(payload)
        if out is not None:
            name = (
                "png" if payload.startswith(_PNG_SIG)
                else "jpeg" if payload.startswith(_JPEG_SOI)
                else "wav"
            )
            return out, name
        if strict:
            raise NotImplementedError(
                "no codec for this payload (first bytes "
                f"{payload[:4]!r}); pass decode_fn or strict=False"
            )
        return _fake_features(payload, dim), "stub"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_one(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": [f for f, _ in decoded],
                    "decoder": [d for _, d in decoded],
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
