"""Materialize the golden multimodal-features parquet (FIXTURES.md §A4).

The multimodal family (real pure-python BMP/WAV/y4m codecs, honest mp4
stub) cannot be recomputed by DuckDB — but its RESULT on the seeded
synthetic media table is a plain table. This script runs the
encode → decode → feature pipeline PURELY LOCALLY (numpy, no Spark)
over the same seeded workload as ``multimodal.synthetic_media`` and
commits (media_id, modality, fmt, payload_bytes, feat_norm). The
declared query's oracle reads the golden, so a driver hash-pass proves
the distributed Arrow/mapInPandas pipeline reproduces an independently
materialized artifact — the ``approx_stats_bounded`` pattern applied to
the codec path.

Run: python scripts/gen_multimodal_golden.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from play_with_pulsar_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    encode_bmp,
    encode_wav,
    encode_y4m,
)

N_MEDIA = 64
SEED = 42

SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("modality", pa.string()),
        ("fmt", pa.string()),
        ("payload_bytes", pa.int64()),
        ("feat_norm", pa.float64()),
    ]
)


def synthetic_payloads(n: int = N_MEDIA, seed: int = SEED):
    """(i, modality, fmt, payload) — MUST mirror
    ``multimodal.synthetic_media`` exactly (same seeds, same shapes)."""
    import hashlib

    for i in range(n):
        rng = np.random.RandomState(seed * 1009 + i)
        modality = ["image", "audio", "video"][i % 3]
        if modality == "image":
            fmt = "bmp"
            w, h = 16 + i % 17, 12 + i % 13
            payload = encode_bmp(rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8))
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
        elif i % 6 == 2:
            fmt = "y4m"
            w, h = 8 + i % 9, 6 + i % 7
            n_frames = 3 + i % 5
            frames = rng.randint(0, 256, size=(n_frames, h, w, 3), dtype=np.uint8)
            payload = encode_y4m(frames, fps=10)
        else:
            fmt = "mp4"
            hsh = hashlib.sha256(f"{seed}:{i}".encode()).digest()
            size = 1000 + (i * 37) % 3000
            payload = (hsh * (size // len(hsh) + 1))[:size]
        yield i, modality, fmt, payload


def feature_norm(payload: bytes, fmt: str) -> float:
    """Same arithmetic as ``multimodal.extract_features``'s kernel
    (chunk means of the decoded array) + the query's L2 norm, computed
    with a LEFT FOLD like Spark's F.aggregate so the sum order matches
    bitwise. Stored UNROUNDED — the oracle applies round(, 6) in
    DuckDB, mirroring the query's F.round, so one engine's rounding
    rule never enters the golden."""
    arr = np.asarray(decode_media(payload, fmt, strict=False), dtype=np.float64).ravel()
    m = np.zeros(FEATURE_DIM)
    if len(arr):
        chunks = np.array_split(arr, FEATURE_DIM)
        m = np.array([c.mean() if len(c) else 0.0 for c in chunks])
    acc = 0.0
    for x in m.tolist():
        acc += x * x
    return float(np.sqrt(acc))


def golden_rows() -> list[dict]:
    rows = []
    for i, modality, fmt, payload in synthetic_payloads():
        rows.append(
            dict(
                media_id=i,
                modality=modality,
                fmt=fmt,
                payload_bytes=len(payload),
                feat_norm=feature_norm(payload, fmt),
            )
        )
    return rows


def main() -> None:
    fixture_dir = os.path.join(os.path.dirname(__file__), "..", "fixtures")
    rows = golden_rows()
    table = pa.Table.from_pydict(
        {name: [r[name] for r in rows] for name in SCHEMA.names}, schema=SCHEMA
    )
    out = os.path.join(fixture_dir, "multimodal_features_golden.parquet")
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
