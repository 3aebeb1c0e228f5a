"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.
The Spark-side plumbing (schemas, batch shape, partition safety) is real
and tested; the actual codec work is stubbed deterministically because the
decode libraries are not in this container - swap ``_fake_decode`` for a
real decoder (PIL/av) in production, the dataflow is unchanged.
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
