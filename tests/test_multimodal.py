"""Multimodal plumbing tests: real schema/batching/partitioning, with
the codec stub swapped for the deterministic fake decoder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from play_with_pulsar_spark.operators import multimodal as mm


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


def test_strict_decode_raises(spark, media):
    with pytest.raises(Exception) as ei:
        mm.extract_features(media, strict_decode=True).collect()
    assert "NotImplementedError" in str(ei.value) or "no codec" in str(ei.value)


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
    assert all(len(bytes(r.payload)) == 8 * 6 for r in rows)


def test_frame_sampling_is_flatmap(media):
    frames = mm.sample_video_frames(media, every_ms=1000)
    pdf = frames.toPandas()
    n_videos = media.filter(F.col("modality") == "video").count()
    assert len(pdf) > n_videos  # more rows out than in
    assert (pdf["frame_ms"] % 1000 == 0).all()
