"""Distributed PCA (similarity/pca.py): layout-independent determinism of
the exact-integer moment sums, orthonormal components, descending
variance, known-direction recovery on crafted data, and projection
behavior."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from conftest import SF_SMALL

from enterprise_data_quality_platform_spark.catalog import table
from enterprise_data_quality_platform_spark.similarity.pca import (
    fit_pca,
    project_pca,
)


def test_fit_deterministic_across_layouts(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    m1 = fit_pca(emb, k=4)
    m2 = fit_pca(emb.repartition(17, "vec_id"), k=4)
    assert m1["n"] == m2["n"]
    assert np.array_equal(m1["mean"], m2["mean"])  # bit-identical
    assert np.array_equal(m1["components"], m2["components"])
    assert np.array_equal(m1["explained_variance"], m2["explained_variance"])


def test_components_orthonormal_and_variance_descending(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    m = fit_pca(emb, k=6)
    c = m["components"]
    assert np.allclose(c @ c.T, np.eye(len(c)), atol=1e-9)
    v = m["explained_variance"]
    assert all(v[i] >= v[i + 1] - 1e-12 for i in range(len(v) - 1))
    assert 0 < m["explained_ratio"].sum() <= 1 + 1e-9


def test_recovers_dominant_direction(spark):
    """Crafted corpus: points spread along one known axis + small noise in
    another — the first component must align with the dominant axis."""
    rng = np.random.default_rng(11)
    direction = np.zeros(8)
    direction[3] = 1.0
    rows = []
    for i in range(400):
        v = rng.normal(0, 5.0) * direction
        v[6] += rng.normal(0, 0.1)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m = fit_pca(df, k=2, vec_col="embedding")
    c1 = m["components"][0]
    assert abs(c1[3]) > 0.99  # aligned with the planted axis
    assert c1[3] > 0  # sign normalization: largest component positive
    assert m["explained_ratio"][0] > 0.95


def test_projection_shape_and_centering(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    m = fit_pca(emb, k=3)
    proj = project_pca(emb, m)
    row = proj.select("pca").first()
    assert len(row["pca"]) == 3
    # projections of a centered fit have ~zero mean per component
    means = proj.agg(
        *[F.avg(F.element_at("pca", i + 1)).alias(f"m{i}") for i in range(3)]
    ).collect()[0]
    for i in range(3):
        assert abs(means[i]) < 1e-3


def test_full_rank_projection_preserves_total_variance(spark):
    """k = d keeps all variance: per-component projected variances sum to
    the trace of the covariance (rotation preserves total variance)."""
    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1.0, 6)]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m = fit_pca(df, k=6, vec_col="embedding")
    assert np.isclose(
        m["explained_variance"].sum() / m["explained_ratio"].sum(),
        m["explained_variance"].sum(),
        rtol=1e-6,
    )
    assert np.isclose(m["explained_ratio"].sum(), 1.0, atol=1e-9)


def test_fit_pca_null_rows_and_empty_corpus(spark):
    """ADVICE r5: NULL embedding rows must be filtered from the moment-sum
    pass (not only the dimension probe), and an all-null/empty corpus must
    raise a clear ValueError instead of a TypeError on None."""
    import pytest

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 4)]) for i in range(50)]
    rows += [(100 + i, None) for i in range(5)]  # NULL vectors interleaved
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m = fit_pca(df, k=2, vec_col="embedding")
    assert m["n"] == 50  # nulls excluded from the count
    m_clean = fit_pca(
        df.filter(F.col("embedding").isNotNull()), k=2, vec_col="embedding"
    )
    assert np.array_equal(m["mean"], m_clean["mean"])

    empty = df.filter(F.col("embedding").isNull())
    with pytest.raises(ValueError, match="no non-null embedding"):
        fit_pca(empty, k=2, vec_col="embedding")
