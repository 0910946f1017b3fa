"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The sandbox has no image/audio codecs, so the decode step is STUBBED
(deterministic fake features derived from the bytes; a real deployment
swaps `_decode_stub` for PIL/torchaudio/ffmpeg).  Everything Spark-side
is real and tested: binary schema, Arrow batch shape through
``mapInPandas``, per-kind dispatch, partition-preserving plumbing.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType()),
        StructField("magic", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def media_payloads(extracted: DataFrame) -> DataFrame:
    """Explode media spans from extraction output into a binary-column
    table.  Payloads here are deterministic fakes (md5 bytes of the
    ref); in production this is the blob-store fetch."""
    media = (
        extracted.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") != "text")
        .select(
            "doc_id",
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.kind").alias("kind"),
        )
    )
    return media.withColumn(
        "payload", F.unhex(F.md5("media_ref"))
    )


def _decode_stub(kind: str, payload: bytes) -> dict:
    """Deterministic fake decode.  Replace with a real codec in
    production; the signature and batch shape are the contract.

    Raises NotImplementedError for kinds a real decoder would need
    codec support for that this container lacks -- callers decide
    whether to quarantine or skip.
    """
    if payload is None:
        raise NotImplementedError(f"no payload bytes for {kind}")
    h = hashlib.md5(payload).digest()
    base = {
        "n_bytes": len(payload),
        "magic": payload[:4].hex(),
        "width": None,
        "height": None,
        "duration_ms": None,
        # 8-dim fake embedding from the digest -- stands in for a
        # CLIP/CLAP feature vector
        "embedding": [((b / 255.0) * 2 - 1) for b in h[:8]],
    }
    if kind == "image":
        base["width"] = 16 + h[0] % 2048
        base["height"] = 16 + h[1] % 2048
    elif kind in ("audio", "video"):
        base["duration_ms"] = 1000 + int.from_bytes(h[2:4], "big")
        if kind == "video":
            base["width"] = 16 + h[0] % 2048
            base["height"] = 16 + h[1] % 2048
    else:
        raise NotImplementedError(f"unknown media kind: {kind}")
    return base


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                try:
                    feat = _decode_stub(r.kind, bytes(r.payload))
                except NotImplementedError:
                    feat = {
                        "n_bytes": None,
                        "magic": None,
                        "width": None,
                        "height": None,
                        "duration_ms": None,
                        "embedding": None,
                    }
                rows.append(
                    {
                        "doc_id": r.doc_id,
                        "media_ref": r.media_ref,
                        "kind": r.kind,
                        **feat,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURES_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_w", IntegerType()),
        StructField("resized_h", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(media: DataFrame, max_px: int = 256) -> DataFrame:
    """Resize plumbing for image payloads: aspect-preserving fit into
    ``max_px``.  The pixel work is STUBBED (dims from the decode stub,
    output payload a deterministic fake); schema, filtering, batch
    shape, and the resize arithmetic are real -- a deployment swaps the
    two marked lines for PIL."""

    imgs = media.filter(F.col("kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                feat = _decode_stub("image", bytes(r.payload))  # STUB: PIL.open
                w, h = feat["width"], feat["height"]
                scale = min(max_px / w, max_px / h, 1.0)
                rw, rh = max(int(w * scale), 1), max(int(h * scale), 1)
                out = hashlib.md5(
                    bytes(r.payload) + f"{rw}x{rh}".encode()
                ).digest()  # STUB: PIL.resize + encode
                rows.append(
                    {
                        "doc_id": r.doc_id,
                        "media_ref": r.media_ref,
                        "width": w,
                        "height": h,
                        "resized_w": rw,
                        "resized_h": rh,
                        "payload": out,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return imgs.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("t_ms", IntegerType(), False),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled timestamp (1 -> N inside the Arrow batch).  Frame bytes are
    STUBBED (md5 of payload+t); duration comes from the decode stub --
    a deployment swaps those for ffmpeg seek+decode."""

    vids = media.filter(F.col("kind") == "video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                feat = _decode_stub("video", bytes(r.payload))  # STUB: ffprobe
                dur = feat["duration_ms"]
                for idx, t in enumerate(range(0, dur, every_ms)):
                    frame = hashlib.md5(
                        bytes(r.payload) + t.to_bytes(4, "big")
                    ).digest()  # STUB: ffmpeg -ss t
                    rows.append(
                        {
                            "doc_id": r.doc_id,
                            "media_ref": r.media_ref,
                            "frame_idx": idx,
                            "t_ms": t,
                            "frame": frame,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAMES_SCHEMA.fields]
            )

    return vids.mapInPandas(run, schema=FRAMES_SCHEMA)
