"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.
The Spark-side plumbing (schemas, batch shape, partition safety) is real
and tested. Image dimensions are REAL for PNG/GIF/BMP/JPEG via pure-stdlib
header parsing (:func:`decode_image_header` - no pixel decode needed for
width/height). Full pixel decode and audio/video probing are stubbed
deterministically because the codec libraries are not in this container -
swap ``_fake_decode`` for PIL/av in production, the dataflow is unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),      # image | audio | video
    StructField("payload", BinaryType(), True),
    StructField("mime", StringType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("byte_len", LongType(), False),
    StructField("sha256", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_s", DoubleType(), True),
    StructField("feature_v0", DoubleType(), True),
])

HAVE_PIL = False
try:  # decode libs are optional; plumbing works without them
    import PIL  # noqa: F401
    HAVE_PIL = True
except ImportError:
    pass


def decode_image_header(payload: bytes):
    """Real (width, height, format) from image container headers.

    Pure stdlib byte parsing - PNG IHDR, GIF logical screen descriptor,
    BMP BITMAPINFOHEADER, JPEG SOFn frame header. Returns None for
    anything unrecognized/truncated (caller falls back to the stub).
    """
    import struct
    if len(payload) < 12:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return (w, h, "png")
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return (w, h, "gif")
    if payload[:2] == b"BM" and len(payload) >= 26:
        hdr_size = struct.unpack("<I", payload[14:18])[0]
        if hdr_size >= 40:  # BITMAPINFOHEADER and later
            w, h = struct.unpack("<ii", payload[18:26])
            return (w, abs(h), "bmp")
        if hdr_size == 12 and len(payload) >= 22:  # BITMAPCOREHEADER
            w, h = struct.unpack("<HH", payload[18:22])
            return (w, h, "bmp")
        return None
    if payload[:2] == b"\xff\xd8":  # JPEG: scan markers for SOFn
        i = 2
        n = len(payload)
        while i + 9 < n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker in (0xD9, 0xDA, 0x00):
                # EOI / SOS / byte-stuffed 0xFF00: past the marker segments.
                # A well-formed frame places SOFn before SOS, so if we got
                # here without one the dimensions are unknowable — walking
                # into entropy-coded data would read bogus segment lengths.
                return None
            seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
            if (0xC0 <= marker <= 0xCF
                    and marker not in (0xC4, 0xC8, 0xCC)):
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                return (w, h, "jpeg")
            i += 2 + seg_len
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        fourcc = payload[12:16]
        if fourcc == b"VP8 " and len(payload) >= 30:
            if payload[23:26] == b"\x9d\x01\x2a":
                w = struct.unpack("<H", payload[26:28])[0] & 0x3FFF
                h = struct.unpack("<H", payload[28:30])[0] & 0x3FFF
                return (w, h, "webp")
            return None
        if fourcc == b"VP8L" and len(payload) >= 25:
            if payload[20] != 0x2F:
                return None
            bits = struct.unpack("<I", payload[21:25])[0]
            return ((bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, "webp")
        if fourcc == b"VP8X" and len(payload) >= 30:
            w = int.from_bytes(payload[24:27], "little") + 1
            h = int.from_bytes(payload[27:30], "little") + 1
            return (w, h, "webp")
        return None
    return None


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for decode/feature-extract.

    Derives pseudo width/height/duration from the payload hash so tests are
    stable; replace with PIL/librosa/av decode in production.
    """
    if not payload:
        return {"width": None, "height": None, "duration_s": None,
                "feature_v0": 0.0}
    h = hashlib.sha256(payload).digest()
    if kind == "image":
        return {
            "width": 64 + h[0] % 192,
            "height": 64 + h[1] % 192,
            "duration_s": None,
            "feature_v0": int.from_bytes(h[2:6], "big") / 2**32,
        }
    if kind in ("audio", "video"):
        return {
            "width": None if kind == "audio" else 320 + h[0] % 320,
            "height": None if kind == "audio" else 240 + h[1] % 240,
            "duration_s": 1.0 + (int.from_bytes(h[2:4], "big") % 600),
            "feature_v0": int.from_bytes(h[4:8], "big") / 2**32,
        }
    raise NotImplementedError(f"unknown media kind: {kind}")


def _feature_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {f.name: [] for f in FEATURE_SCHEMA.fields}
        for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                      pdf["payload"]):
            raw = bytes(payload) if payload is not None else b""
            feats = None
            if kind == "image":
                hdr = decode_image_header(raw)
                if hdr is not None:
                    w, h, _fmt = hdr
                    feats = {"width": w, "height": h, "duration_s": None,
                             "feature_v0": (w * h) / 2**24}
            if feats is None:
                feats = _fake_decode(raw, kind)
            out["media_id"].append(mid)
            out["kind"].append(kind)
            out["byte_len"].append(len(raw))
            out["sha256"].append(hashlib.sha256(raw).hexdigest())
            out["width"].append(feats["width"])
            out["height"].append(feats["height"])
            out["duration_s"].append(feats["duration_s"])
            out["feature_v0"].append(feats["feature_v0"])
        yield pd.DataFrame(out)


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over opaque media payloads.

    Arrow batches bound by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
    pair with ``engine.partition_pages``-style skew split when payloads are
    multi-MB.
    """
    return media.select("media_id", "kind", "payload").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA)
