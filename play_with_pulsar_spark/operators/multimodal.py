"""Multimodal columns: image/audio/video as opaque binary + metadata.

Design (the part that must be right at 100 TB):

- media is an opaque ``binary`` column travelling WITH a typed
  metadata struct (modality, format, width/height/duration, byte
  size) — schema-on-read stays cheap because filters/pruning work on
  the metadata columns while the blob column is only deserialized in
  the decode stage;
- decode / feature-extract / resize / frame-sample are
  ``mapInPandas`` stages — per-partition Arrow batches of raw bytes
  in, feature rows out, so the heavy Python/C library work is
  batched and never per-row-serialized;
- batch size is controlled by ``spark.sql.execution.arrow.
  maxRecordsPerBatch`` — for multi-MB blobs set it low (OOM control);
- real codecs (PIL/libav/etc.) are NOT in this container: the decode
  kernel is STUBBED — ``decode_media(..., strict=True)`` raises
  NotImplementedError; the default test path substitutes a
  deterministic fake decoder so the Spark-side plumbing (schema,
  partitioning, UDF signature, batch shape) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("fmt", StringType(), True),  # png|wav|mp4|...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("n_bytes", LongType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("feature", StringType(), False),  # named feature row
        StructField("value", StringType(), True),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes are seeded
    pseudo-random, sized like thumbnails — stands in for a real
    binary-file source (``spark.read.format('binaryFile')`` in
    production)."""
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        payload = (h * ((1000 + (i * 37) % 3000) // len(h) + 1))[: 1000 + (i * 37) % 3000]
        modality = ["image", "audio", "video"][i % 3]
        fmt = {"image": "png", "audio": "wav", "video": "mp4"}[modality]
        rows.append(
            (
                i,
                modality,
                fmt,
                64 + i % 128 if modality != "audio" else None,
                48 + i % 96 if modality != "audio" else None,
                1000 + i * 250 if modality != "image" else None,
                len(payload),
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media(payload: bytes, fmt: str, strict: bool = True) -> np.ndarray:
    """Decode a media blob to a pixel/sample array.

    STUB: real decoding needs codec libraries not present in this
    environment. ``strict=True`` (production behavior) raises;
    ``strict=False`` returns a deterministic fake "decoded" array
    derived from the payload bytes, used to exercise the pipeline.
    """
    if strict:
        raise NotImplementedError(
            f"no codec for {fmt!r} in this environment — install PIL/av and "
            "replace this stub; the Spark plumbing is codec-agnostic"
        )
    arr = np.frombuffer(payload[:4096], dtype=np.uint8).astype(np.float64)
    return arr


def extract_features(
    media: DataFrame, strict_decode: bool = False, batch_limit_bytes: int = 64 << 20
) -> DataFrame:
    """Feature extraction over binary payloads: mapInPandas batches →
    decode (stub) → per-item feature vector (moments of the decoded
    array) — the plumbing (schema in/out, Arrow batching, partition
    parallelism) is exactly what a real extractor uses.

    Output: (media_id, modality, feat: array<double>[FEATURE_DIM]).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for payload, fmt in zip(pdf["payload"], pdf["fmt"]):
                arr = decode_media(bytes(payload), fmt, strict=strict_decode)
                m = np.zeros(FEATURE_DIM)
                if len(arr):
                    chunks = np.array_split(arr, FEATURE_DIM)
                    m = np.array([c.mean() if len(c) else 0.0 for c in chunks])
                feats.append(m.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feat": feats,
                }
            )

    return media.select("media_id", "modality", "fmt", "payload").mapInPandas(
        kernel, schema="media_id long, modality string, feat array<double>"
    )


def resize_images(media: DataFrame, width: int, height: int, strict_decode: bool = False) -> DataFrame:
    """Resize stage: filters to images on METADATA (no blob touch for
    non-images — the filter prunes before deserialization), then maps
    payloads through the (stubbed) decoder+resizer."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for payload, fmt in zip(pdf["payload"], pdf["fmt"]):
                arr = decode_media(bytes(payload), fmt, strict=strict_decode)
                # stub resize: deterministic resample of the fake array
                idx = np.linspace(0, max(len(arr) - 1, 0), num=width * height).astype(int)
                out.append(bytearray(arr[idx].astype(np.uint8).tobytes()) if len(arr) else bytearray(b""))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": out,
                 "width": width, "height": height}
            )

    imgs = media.filter(F.col("modality") == "image")
    return imgs.select("media_id", "fmt", "payload").mapInPandas(
        kernel, schema="media_id long, payload binary, width int, height int"
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000, strict_decode: bool = False) -> DataFrame:
    """Frame sampling: one output row per sampled frame timestamp —
    a flatMap shape (mapInPandas yielding more rows than input)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, ts, frames = [], [], []
            for mid, payload, fmt, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["fmt"], pdf["duration_ms"]
            ):
                arr = decode_media(bytes(payload), fmt, strict=strict_decode)
                for t in range(0, int(dur or 0), every_ms):
                    ids.append(mid)
                    ts.append(t)
                    lo = (t * 7) % max(len(arr) - 16, 1)
                    frames.append(bytearray(arr[lo : lo + 16].astype(np.uint8).tobytes()))
            yield pd.DataFrame({"media_id": ids, "frame_ms": ts, "frame": frames})

    vids = media.filter(F.col("modality") == "video")
    return vids.select("media_id", "fmt", "payload", "duration_ms").mapInPandas(
        kernel, schema="media_id long, frame_ms int, frame binary"
    )
