"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
determinism, and the explicit decode stub boundary."""

from __future__ import annotations

import pytest

from distributed_system_mapreduce_spark.functions.multimodal import (
    FEATURE_SCHEMA,
    N_FEATURES,
    decode_bytes,
    fake_media_from_documents,
    media_features,
    resize_images,
    sample_frames,
)
from distributed_system_mapreduce_spark.sources.io import load

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load(spark, SF_SMOKE, "documents").limit(60)
    return fake_media_from_documents(docs).cache()


def test_decode_stub_raises_without_codec():
    with pytest.raises(NotImplementedError):
        decode_bytes(b"xxxx", "image")


def test_media_features_schema_and_shape(spark, media):
    feats = media_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows:
        assert len(r["features"]) == N_FEATURES
        assert r["n_bytes"] > 0


def test_media_features_deterministic(spark, media):
    a = sorted(
        (r["media_id"], tuple(r["features"])) for r in media_features(media).collect()
    )
    b = sorted(
        (r["media_id"], tuple(r["features"])) for r in media_features(media).collect()
    )
    assert a == b


def test_resize_updates_metadata_only(spark, media):
    resized = resize_images(media, 224, 224)
    r = resized.limit(1).collect()[0]
    assert (r["width"], r["height"]) == (224, 224)
    # bytes untouched
    orig = media.limit(1).collect()[0]
    assert bytes(r["data"]) == bytes(orig["data"])


def test_sample_frames_expands_video_rows(spark, media):
    frames = sample_frames(media, every_n=2)
    rows = frames.collect()
    n_videos = media.filter("media_type = 'video'").count()
    assert len(rows) >= n_videos  # ≥1 sampled frame per video
    assert all(r["frame_index"] % 2 == 0 for r in rows)


def test_features_partitioning_preserved(spark, media):
    spread = media.repartition(4)
    feats = media_features(spread)
    assert feats.rdd.getNumPartitions() == 4
