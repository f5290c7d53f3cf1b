"""Tests for product quantization (similarity/pq.py): codebook shape,
encode determinism, reconstruction sanity, ADC recall vs exact cosine."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from conftest import SF_SMALL

from enterprise_data_quality_platform_spark.catalog import table
from enterprise_data_quality_platform_spark.functions.vectors import to_double
from enterprise_data_quality_platform_spark.similarity.knn import brute_force_topk
from enterprise_data_quality_platform_spark.similarity.pq import (
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)


def test_codebooks_shape_and_determinism(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    b1 = train_pq_codebooks(emb, m=8, k=16, sample_size=500)
    b2 = train_pq_codebooks(emb, m=8, k=16, sample_size=500)
    assert b1.shape == (8, 16, 8)  # 64-dim / m=8 -> sub_dim 8
    assert np.array_equal(b1, b2)  # seeded


def test_encode_codes_in_range(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    books = train_pq_codebooks(emb, m=8, k=16, sample_size=500)
    codes = emb.select(
        pq_encode(F.col("embedding"), books).alias("c")
    ).collect()
    for r in codes:
        assert len(r.c) == 8
        assert all(0 <= v < 16 for v in r.c)


def test_identical_vectors_share_codes(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    books = train_pq_codebooks(emb, m=8, k=16, sample_size=500)
    one = emb.limit(1).select("embedding")
    two = one.unionAll(one)
    codes = two.select(pq_encode(F.col("embedding"), books).alias("c")).collect()
    assert codes[0].c == codes[1].c


def test_adc_recall_vs_bruteforce(spark):
    """PQ@10 must recover most of the exact top-10 — the standard recall
    trade. m=8 subspaces of an already-low-dim 64-d space: expect >=0.5
    mean recall on this synthetic corpus, and the true top-1 neighbor
    inside PQ's top-10 for most probes."""
    emb = table(spark, SF_SMALL, "embeddings")
    books = train_pq_codebooks(emb, m=8, k=64, sample_size=2000)
    probes = emb.limit(5).select(
        F.col("vec_id").alias("probe_id"),
        to_double(F.col("embedding")).alias("pvec"),
    )
    exact = brute_force_topk(emb, probes, k=10)
    approx = pq_adc_topk(emb, probes, books, k=10)
    e = {}
    for r in exact.collect():
        e.setdefault(r.probe_id, []).append(r.vec_id)
    a = {}
    for r in approx.collect():
        a.setdefault(r.probe_id, []).append(r.vec_id)
    recalls = [
        len(set(e[p]) & set(a[p])) / len(e[p]) for p in e
    ]
    assert sum(recalls) / len(recalls) >= 0.5
    # self-similarity: each probe's own vector must rank first under ADC
    hits = sum(1 for p in a if a[p][0] == p)
    assert hits >= 4
