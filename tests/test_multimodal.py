"""Tests for the multimodal operators: Arrow plumbing determinism, frame
fan-out shape, and the clearly-marked decode stubs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_examples_spark.operators.media import (
    decode_image,
    extract_features,
    resize_image,
    sample_frames,
)
from data_engineering_examples_spark.sources.fhir import FIXTURES_DIR


def _media(spark):
    return spark.read.parquet(f"{FIXTURES_DIR}/media.parquet")


def test_feature_extraction_deterministic_and_normalized(spark):
    m = _media(spark)
    a = {r.media_id: r.features for r in extract_features(m).collect()}
    b = {r.media_id: r.features for r in extract_features(m.repartition(7)).collect()}
    assert a == b  # partitioning must not change results
    for feats in list(a.values())[:20]:
        assert len(feats) == 16
        assert abs(sum(feats) - 1.0) < 1e-9  # L1-normalized histogram


def test_frame_sampling_fanout(spark):
    m = _media(spark)
    n_videos = m.filter(F.col("kind") == "video").count()
    frames = sample_frames(m, n_frames=4, frame_bytes=64)
    rows = frames.collect()
    assert len(rows) == 4 * n_videos
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, fr in list(by_media.items())[:10]:
        assert sorted(f.frame_idx for f in fr) == [0, 1, 2, 3]
        assert all(0 < len(f.frame_bytes) <= 64 for f in fr)


def test_decode_stubs_raise_without_injected_decoder():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")
    with pytest.raises(NotImplementedError):
        resize_image(b"\x89PNG...", 64, 64)
    # injected decoder path works (the production contract)
    assert decode_image(b"abc", decoder=lambda b: len(b)) == 3
