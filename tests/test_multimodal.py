"""Multimodal tests: real BMP/WAV codecs (pure python), real
schema/batching/partitioning; video decode remains a deterministic
fake (no mp4 codec in this container)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from play_with_pulsar_spark.operators import multimodal as mm


def test_bmp_roundtrip():
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (5, 3), (12, 17)]:  # incl. non-4-aligned rows
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (mm.decode_bmp(mm.encode_bmp(px)) == px).all()


def test_wav_roundtrip():
    rng = np.random.RandomState(7)
    samples = rng.randint(-32768, 32767, size=1234).astype(np.int16)
    assert (mm.decode_wav(mm.encode_wav(samples, 8000)) == samples).all()


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, n=48, seed=42).cache()


def test_media_table_shape(media):
    assert media.count() == 48
    assert {r.modality for r in media.select("modality").distinct().collect()} == {
        "image", "audio", "video",
    }
    sizes = media.select(
        (F.length("payload") == F.col("n_bytes")).alias("ok")
    ).collect()
    assert all(r.ok for r in sizes)


def test_strict_decode_raises_for_codecless_video(spark, media):
    with pytest.raises(Exception) as ei:
        mm.extract_features(media, strict_decode=True).collect()
    assert "NotImplementedError" in str(ei.value) or "no codec" in str(ei.value)


def test_strict_decode_works_for_bmp_and_wav(media):
    """Image + audio features come from ACTUALLY decoded pixels and
    samples — the strict path succeeds without any codec library."""
    real = media.filter(F.col("modality") != "video")
    rows = mm.extract_features(real, strict_decode=True).collect()
    assert len(rows) == real.count()
    # image features are pixel-value means: bounded by uint8 range
    img_ids = {r.media_id for r in media.filter(F.col("modality") == "image").collect()}
    for r in rows:
        if r.media_id in img_ids:
            assert all(0.0 <= v <= 255.0 for v in r.feat)


def test_image_features_match_local_decode(media):
    """Spark-side feature of one image == locally decoded moments."""
    row = media.filter(F.col("modality") == "image").orderBy("media_id").first()
    px = mm.decode_bmp(bytes(row.payload))
    arr = px.astype(np.float64).ravel()
    chunks = np.array_split(arr, mm.FEATURE_DIM)
    want = [c.mean() for c in chunks]
    got = (
        mm.extract_features(media.filter(F.col("media_id") == row.media_id),
                            strict_decode=True)
        .first()
        .feat
    )
    assert np.allclose(got, want)


def test_feature_extraction_shape_and_determinism(media):
    f1 = mm.extract_features(media).orderBy("media_id").collect()
    f2 = mm.extract_features(media.repartition(7)).orderBy("media_id").collect()
    assert len(f1) == 48
    assert all(len(r.feat) == mm.FEATURE_DIM for r in f1)
    # partitioning must not change results (per-item kernel)
    assert [(r.media_id, r.feat) for r in f1] == [(r.media_id, r.feat) for r in f2]


def test_resize_filters_on_metadata(media):
    out = mm.resize_images(media, 8, 6)
    rows = out.collect()
    assert len(rows) == media.filter(F.col("modality") == "image").count()
    # outputs are real 8x6 BMPs
    for r in rows:
        assert mm.decode_bmp(bytes(r.payload)).shape == (6, 8, 3)


def test_frame_sampling_is_flatmap(media):
    frames = mm.sample_video_frames(media, every_ms=1000)
    pdf = frames.toPandas()
    n_videos = media.filter(F.col("modality") == "video").count()
    assert len(pdf) > n_videos  # more rows out than in
    assert (pdf["frame_ms"] % 1000 == 0).all()


def test_y4m_roundtrip():
    """RGB -> y4m -> RGB survives within the BT.601 matrix rounding
    (±2 per channel); frame count, geometry, and header exact."""
    import numpy as np

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, size=(4, 6, 8, 3), dtype=np.uint8)
    blob = mm.encode_y4m(frames, fps=10)
    assert blob.startswith(b"YUV4MPEG2 W8 H6 F10:1")
    back = mm.decode_y4m(blob)
    assert back.shape == frames.shape
    assert np.abs(back.astype(int) - frames.astype(int)).max() <= 2


def test_strict_decode_works_for_y4m(media):
    """y4m videos decode for REAL under strict mode — only mp4 remains
    a stub."""
    y4m = media.filter(F.col("fmt") == "y4m")
    assert y4m.count() > 0
    rows = mm.extract_features(y4m, strict_decode=True).collect()
    assert len(rows) == y4m.count()
    for r in rows:
        assert all(0.0 <= v <= 255.0 for v in r.feat)  # pixel means


def test_y4m_frame_sampling_emits_real_frames(spark, media):
    """Sampled y4m frames are the decoded frames' raw RGB bytes."""
    import numpy as np

    y4m = media.filter(F.col("fmt") == "y4m")
    one = y4m.limit(1).collect()[0]
    sampled = {
        r.frame_ms: bytes(r.frame)
        for r in mm.sample_video_frames(y4m, every_ms=100, strict_decode=True)
        .filter(F.col("media_id") == one.media_id)
        .collect()
    }
    assert sampled
    arr = mm.decode_y4m(bytes(one.payload))
    n_frames, dur = len(arr), one.duration_ms
    for t, frame_bytes in sampled.items():
        idx = min(t * n_frames // max(dur, 1), n_frames - 1)
        assert frame_bytes == arr[idx].tobytes()


def test_multimodal_golden_in_sync_with_generator():
    # round-6 driver hash gate: the committed golden
    # (scripts/gen_multimodal_golden.py — local numpy pipeline, no
    # Spark) must match a fresh recomputation, so codec or fixture
    # drift fails CI before the driver's oracle comparison.
    import os
    import sys

    import pyarrow.parquet as pq

    root = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, os.path.join(root, "scripts"))
    import gen_multimodal_golden as G

    committed = pq.read_table(
        os.path.join(root, "fixtures", "multimodal_features_golden.parquet")
    ).to_pylist()
    assert committed == G.golden_rows(), "multimodal golden drifted"
