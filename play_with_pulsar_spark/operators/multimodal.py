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
- codecs: BMP (24bpp uncompressed, struct+numpy) and WAV (PCM16,
  stdlib ``wave``) are REAL pure-python decoders — image and audio
  features come from actually-decoded pixels/samples. Video (mp4)
  still needs libav and stays STUBBED: ``strict=True`` raises
  NotImplementedError for formats without a codec; ``strict=False``
  substitutes a deterministic fake array so the frame-sampling
  plumbing is still exercised end-to-end.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
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


# --- real pure-python codecs: BMP (24bpp BI_RGB) and WAV (PCM16) ---


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24bpp uncompressed bottom-up BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER; rows padded to 4 bytes).
    Format per the public Windows BMP spec."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row_size = (3 * w + 3) & ~3
    img_size = row_size * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    pad = b"\x00" * (row_size - 3 * w)
    bgr = pixels[:, :, ::-1]  # BMP stores BGR
    body = b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))
    return header + info + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """24bpp BI_RGB BMP → (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24bpp uncompressed (BI_RGB) supported")
    bottom_up = h > 0
    h = abs(h)
    row_size = (3 * w + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=off)
    rows = data.reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """1-D int16 mono samples → PCM16 WAV via stdlib ``wave``."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> np.ndarray:
    """PCM16 WAV → (n_frames,) int16 (first channel)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n, ch, sw = wf.getnframes(), wf.getnchannels(), wf.getsampwidth()
        raw = wf.readframes(n)
    if sw != 2:
        raise NotImplementedError("PCM16 only")
    return np.frombuffer(raw, dtype="<i2").reshape(-1, ch)[:, 0].copy()


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """Full-range BT.601 RGB → YCbCr (uint8, same shape)."""
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.stack([y, cb, cr], axis=-1).round(), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """Full-range BT.601 YCbCr → RGB (uint8, same shape)."""
    y, cb, cr = (ycc[..., i].astype(np.float64) for i in range(3))
    cb, cr = cb - 128.0, cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(T, H, W, 3) uint8 RGB → YUV4MPEG2 (y4m) bytes, C444 planar.

    y4m is the uncompressed interchange format of the mjpegtools
    lineage (public spec; what ffmpeg's ``-f yuv4mpeg`` emits): a
    plain-text stream header, then per frame a ``FRAME\\n`` marker and
    raw planar YCbCr. C444 keeps one chroma sample per pixel — no
    subsampling, so the codec stays a pure reshape + colorspace
    matrix and the round-trip error is the ±1 matrix rounding only."""
    t, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C444\n".encode()]
    for i in range(t):
        ycc = _rgb_to_ycbcr(frames[i])
        out.append(b"FRAME\n")
        out.append(ycc[..., 0].tobytes())
        out.append(ycc[..., 1].tobytes())
        out.append(ycc[..., 2].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> np.ndarray:
    """YUV4MPEG2 (C444 planar) → (T, H, W, 3) uint8 RGB."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", "replace").split()
    if not header or header[0] != "YUV4MPEG2":
        raise ValueError("not a y4m payload")
    w = h = None
    colorspace = "C420jpeg"  # spec default when the C tag is absent
    for tag in header[1:]:
        if tag.startswith("W"):
            w = int(tag[1:])
        elif tag.startswith("H"):
            h = int(tag[1:])
        elif tag.startswith("C"):
            colorspace = tag
    if colorspace != "C444":
        raise NotImplementedError("only C444 (no chroma subsampling) supported")
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    plane = w * h
    pos, frames = nl + 1, []
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)  # FRAME line (may carry params)
        if not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed y4m frame marker")
        pos = fnl + 1
        ycc = (
            np.frombuffer(payload, np.uint8, count=3 * plane, offset=pos)
            .reshape(3, h, w)
            .transpose(1, 2, 0)
        )
        frames.append(_ycbcr_to_rgb(ycc))
        pos += 3 * plane
    return np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8)


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL encoded blobs: BMP images
    (seeded pixel noise), WAV audio (sine + noise), and fake mp4 bytes
    for video (no codec in this container). Stands in for a binary-
    file source (``spark.read.format('binaryFile')`` in production)."""
    rows = []
    for i in range(n):
        rng = np.random.RandomState(seed * 1009 + i)
        modality = ["image", "audio", "video"][i % 3]
        if modality == "image":
            fmt = "bmp"
            w, h = 16 + i % 17, 12 + i % 13
            payload = encode_bmp(rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8))
            width, height, dur = w, h, None
        elif modality == "audio":
            fmt = "wav"
            rate = 8000
            n_samp = 400 + (i * 37) % 1200
            t = np.arange(n_samp)
            wave_f = 100.0 + (i % 20) * 40.0
            samples = (
                3000 * np.sin(2 * np.pi * wave_f * t / rate)
                + rng.randint(-500, 500, size=n_samp)
            ).astype(np.int16)
            payload = encode_wav(samples, rate)
            width, height, dur = None, None, int(n_samp * 1000 / rate)
        elif i % 6 == 2:  # video, REAL y4m (frames from seeded noise)
            fmt = "y4m"
            w, h = 8 + i % 9, 6 + i % 7
            fps = 10
            n_frames = 3 + i % 5
            frames = rng.randint(0, 256, size=(n_frames, h, w, 3), dtype=np.uint8)
            payload = encode_y4m(frames, fps=fps)
            width, height, dur = w, h, int(n_frames * 1000 / fps)
        else:  # video, mp4 — honest stub (no compressed codec here)
            fmt = "mp4"
            hsh = hashlib.sha256(f"{seed}:{i}".encode()).digest()
            size = 1000 + (i * 37) % 3000
            payload = (hsh * (size // len(hsh) + 1))[:size]
            width, height, dur = 64 + i % 128, 48 + i % 96, 1000 + i * 250
        rows.append(
            (i, modality, fmt, width, height, dur, len(payload), bytearray(payload))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media(payload: bytes, fmt: str, strict: bool = True) -> np.ndarray:
    """Decode a media blob to a pixel/sample array.

    BMP and WAV decode for real (pure python — see above); formats
    without an in-container codec (mp4, png, …) raise under
    ``strict=True`` (production behavior) or return a deterministic
    fake array under ``strict=False`` so downstream plumbing can be
    exercised. The Spark plumbing is codec-agnostic either way.
    """
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "wav":
        return decode_wav(payload)
    if fmt == "y4m":
        return decode_y4m(payload)
    if strict:
        raise NotImplementedError(
            f"no codec for {fmt!r} in this environment — install PIL/av for "
            "compressed formats; bmp/wav/y4m decode natively"
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
                arr = np.asarray(
                    decode_media(bytes(payload), fmt, strict=strict_decode),
                    dtype=np.float64,
                ).ravel()
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
    payloads through decode → nearest-neighbor resample → re-encode.
    BMP inputs produce real resized BMP outputs; codec-less formats
    fall back to a deterministic byte resample (strict=False only)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for payload, fmt in zip(pdf["payload"], pdf["fmt"]):
                if fmt == "bmp":
                    px = decode_bmp(bytes(payload))
                    ys = np.linspace(0, px.shape[0] - 1, num=height).astype(int)
                    xs = np.linspace(0, px.shape[1] - 1, num=width).astype(int)
                    out.append(bytearray(encode_bmp(px[ys][:, xs])))
                else:
                    arr = decode_media(bytes(payload), fmt, strict=strict_decode)
                    idx = np.linspace(0, max(len(arr) - 1, 0), num=width * height).astype(int)
                    out.append(
                        bytearray(arr[idx].astype(np.uint8).tobytes())
                        if len(arr)
                        else bytearray(b"")
                    )
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
    a flatMap shape (mapInPandas yielding more rows than input).

    y4m inputs emit REAL frames: the sampled timestamp maps to a frame
    index and the row carries that frame's raw RGB bytes. Codec-less
    formats (mp4) keep the deterministic byte-slice fallback under
    ``strict_decode=False`` so the plumbing stays exercised."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, ts, frames = [], [], []
            for mid, payload, fmt, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["fmt"], pdf["duration_ms"]
            ):
                arr = decode_media(bytes(payload), fmt, strict=strict_decode)
                dur = int(dur or 0)
                if fmt == "y4m" and arr.ndim == 4 and len(arr):
                    n_frames = len(arr)
                    for t in range(0, dur, every_ms):
                        idx = min(t * n_frames // max(dur, 1), n_frames - 1)
                        ids.append(mid)
                        ts.append(t)
                        frames.append(bytearray(arr[idx].tobytes()))
                    continue
                flat = np.asarray(arr).ravel()
                for t in range(0, dur, every_ms):
                    ids.append(mid)
                    ts.append(t)
                    lo = (t * 7) % max(len(flat) - 16, 1)
                    frames.append(bytearray(flat[lo : lo + 16].astype(np.uint8).tobytes()))
            yield pd.DataFrame({"media_id": ids, "frame_ms": ts, "frame": frames})

    vids = media.filter(F.col("modality") == "video")
    return vids.select("media_id", "fmt", "payload", "duration_ms").mapInPandas(
        kernel, schema="media_id long, frame_ms int, frame binary"
    )
