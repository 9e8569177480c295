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


def test_byte_sums_match_hashlib_reference(spark, media):
    """The exact int64 decode witnesses (byte_sum/byte_sqsum) equal a
    from-scratch hashlib+numpy re-derivation of decode_bytes(fake=True) —
    the same arithmetic the multimodal_media_features DuckDB oracle encodes
    as md5-hex expansion SQL, so this pins the contract both sides rely on."""
    import hashlib

    import numpy as np

    got = {
        r["media_id"]: (r["byte_sum"], r["byte_sqsum"])
        for r in media_features(media).collect()
    }
    for row in media.select("media_id", "data").collect():
        data = bytes(row["data"])
        seed = hashlib.md5(data).digest()
        n = max(len(data), 16)
        buf = np.frombuffer(
            (seed * (-(-n // len(seed))))[:n], dtype=np.uint8
        ).astype(np.int64)
        assert got[row["media_id"]] == (int(buf.sum()), int((buf**2).sum()))


def test_media_features_oracle_sql_matches_spark(spark):
    """Run the registered md5-expansion oracles in DuckDB and compare against
    the Spark pipeline at the smoke SF (the driver does this at sf0.01)."""
    from distributed_system_mapreduce_spark.registry import ORACLES, QUERIES
    from distributed_system_mapreduce_spark.testing import (
        compare_frames,
        duck_connection,
    )

    con = duck_connection(SF_SMOKE)
    for name in ("multimodal_media_features", "multimodal_frame_sample"):
        sdf = QUERIES[name](spark, SF_SMOKE).toPandas()
        problem = compare_frames(sdf, con.execute(ORACLES[name]).df(), name)
        assert not problem, problem


def test_media_phash_identical_blobs_and_pigeonhole(spark):
    """Byte-identical blobs hash identically (so every exact dup is a
    near-dup candidate AND verifies at Hamming 0), and the banded join's
    pigeonhole guarantee holds: flipping up to PHASH_MAX_HAM bits leaves
    at least one of the PHASH_BANDS bands intact."""
    from distributed_system_mapreduce_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        PHASH_BANDS,
        PHASH_BAND_WIDTH,
        PHASH_MAX_HAM,
        media_phash,
    )

    rows = [
        (1, "image", 8, 8, None, 1, bytearray(b"same-bytes")),
        (2, "image", 8, 8, None, 1, bytearray(b"same-bytes")),
        (3, "image", 8, 8, None, 1, bytearray(b"other-bytes")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r.phash for r in media_phash(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]

    mask = (1 << PHASH_BAND_WIDTH) - 1
    h = got[1]
    for flips in range(1, PHASH_MAX_HAM + 1):
        # flip the lowest `flips` bits — bounded-Hamming neighbor
        h2 = h ^ ((1 << flips) - 1)
        shared = any(
            (h >> (PHASH_BAND_WIDTH * b)) & mask
            == (h2 >> (PHASH_BAND_WIDTH * b)) & mask
            for b in range(PHASH_BANDS)
        )
        assert shared, flips


def test_phash_dedup_counts_consistent(spark):
    """Verified near-dups never exceed candidates; every media type
    reports; the fixture's exact text dups surface as near-dups."""
    from distributed_system_mapreduce_spark.registry import QUERIES

    from conftest import SF_DIR

    rows = QUERIES["multimodal_phash_dedup"](spark, SF_DIR).collect()
    assert {r.media_type for r in rows} == {"image", "audio", "video"}
    for r in rows:
        assert 0 <= r.n_near_dups <= r.n_candidates
    assert sum(r.n_near_dups for r in rows) > 0
