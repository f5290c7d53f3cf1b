"""Tests for perceptual-hash image near-dup (multimodal/phash.py)."""

from __future__ import annotations

import numpy as np
import pytest

from enterprise_data_quality_platform_spark.multimodal.codecs import png_encode
from enterprise_data_quality_platform_spark.multimodal.phash import (
    ahash64,
    image_ahashes,
    phash_neardup_pairs,
)


def _img(seed: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (16, 16), dtype=np.uint8)


def test_ahash_is_deterministic_and_signed64():
    a = _img(1)
    h1, h2 = ahash64(a), ahash64(a.copy())
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)


def test_ahash_robust_to_small_brightness_shift():
    """aHash thresholds at the mean, so a uniform brightness shift leaves
    the hash bits untouched — the 'perceptual' property."""
    a = (_img(2) % 200).astype(np.uint8)  # headroom: +20 never saturates
    brighter = (a + 20).astype(np.uint8)
    assert ahash64(a) == ahash64(brighter)


def test_ahash_differs_for_unrelated_images():
    assert ahash64(_img(3)) != ahash64(_img(4))


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_neardup_pairs_radius_and_banding(spark):
    """A perturbed copy (few flipped cells) pairs with its original; an
    unrelated image does not. Exercises decode -> hash -> band join ->
    bit_count verify end to end."""
    base = _img(10)
    near = base.copy()
    near[0:2, 0:2] = 255 - near[0:2, 0:2]  # flip one 2x2 aHash cell region
    far = _img(11)
    assert 1 <= _hamming(ahash64(base), ahash64(near)) <= 6
    media = spark.createDataFrame(
        [
            (1, bytearray(png_encode(base)), "image"),
            (2, bytearray(png_encode(near)), "image"),
            (3, bytearray(png_encode(far)), "image"),
            (4, None, "image"),  # null payload -> skipped
            (5, bytearray(b"junk"), "image"),  # undecodable -> skipped
            (6, bytearray(png_encode(base)), "audio"),  # wrong type -> skipped
        ],
        "media_id long, payload binary, media_type string",
    )
    hashes = image_ahashes(media)
    assert hashes.count() == 3
    pairs = phash_neardup_pairs(hashes).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    assert pairs[0].hamming == _hamming(ahash64(base), ahash64(near))


def test_exact_duplicates_pair_at_hamming_zero(spark):
    img = _img(12)
    media = spark.createDataFrame(
        [(i, bytearray(png_encode(img)), "image") for i in (1, 2, 3)],
        "media_id long, payload binary, media_type string",
    )
    pairs = phash_neardup_pairs(image_ahashes(media)).collect()
    assert sorted((r.id_a, r.id_b, r.hamming) for r in pairs) == [
        (1, 2, 0),
        (1, 3, 0),
        (2, 3, 0),
    ]


def test_no_crossjoin_in_pair_plan(spark):
    media = spark.createDataFrame(
        [(1, bytearray(png_encode(_img(13))), "image")],
        "media_id long, payload binary, media_type string",
    )
    pairs = phash_neardup_pairs(image_ahashes(media))
    plan = pairs._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hot_bucket_guard_drops_pathological_buckets(spark):
    """1 image repeated many times would pair O(N²); with max_bucket_size
    below N the bucket is dropped entirely (exact-dup handling belongs to
    hash-groupBy dedup, not pairwise)."""
    img = _img(20)
    media = spark.createDataFrame(
        [(i, bytearray(png_encode(img)), "image") for i in range(10)],
        "media_id long, payload binary, media_type string",
    )
    hashes = image_ahashes(media)
    assert phash_neardup_pairs(hashes, max_bucket_size=5).count() == 0
    assert phash_neardup_pairs(hashes, max_bucket_size=100).count() == 45
