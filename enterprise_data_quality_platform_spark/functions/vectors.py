"""Vector column functions over ``array<float>`` embeddings (SURVEY.md §2.6
X5-X6).

Two tiers:

- Expression forms (``zip_with`` + ``aggregate``): JVM-side, sequential
  accumulation — bit-comparable with DuckDB's list functions after
  rounding. BUT Spark's array ``aggregate`` is CodegenFallback: the lambda
  interprets per element, so corpus-scale scoring pays dims x rows
  interpreted calls.
- ``cosine_batch``: Arrow-vectorized pandas_udf — each batch becomes one
  numpy matrix and the dot products run as a single BLAS/einsum call
  (~5x faster than the HOF form at 200k x 64 dims). Float summation order
  differs from the sequential form at the ~1e-16 level; results are
  rounded to 4 decimals wherever compared across engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def to_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


_cosine_batch_udf = None  # built lazily: pandas_udf needs an active session


def cosine_batch(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine for corpus-scale scoring (one matrix op per
    batch). Use this in hot scoring loops; use ``cosine`` where sequential
    accumulation must mirror an oracle exactly."""
    global _cosine_batch_udf
    if _cosine_batch_udf is None:

        @pandas_udf("double")
        def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
            ma = np.stack(a.to_numpy()).astype(np.float64)
            mb = np.stack(b.to_numpy()).astype(np.float64)
            num = np.einsum("ij,ij->i", ma, mb)
            den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
            return pd.Series(num / den)

        _cosine_batch_udf = _cos
    return _cosine_batch_udf(a, b)


def l2_normalize(a: Column) -> Column:
    n = norm(a)
    return F.transform(a, lambda x: x / n)


def hyperplane_bucket_batch(vec: Column, planes: list[list[float]]) -> Column:
    """Arrow-vectorized hyperplane-LSH bucket id: one (batch x dims) @
    (dims x planes) matrix multiply per batch, sign bits packed into a
    long. The expression form below pays planes x dims interpreted lambda
    calls per row — this is the corpus-scale path. Corpus and probes must
    be bucketed by the SAME function (summation order can flip the sign of
    a dot product within ~1e-16 of zero)."""
    plane_mat = np.asarray(planes, dtype=np.float64)  # (p, d)
    weights = (2 ** np.arange(len(planes))).astype(np.int64)

    @pandas_udf("long")
    def _bucket(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        signs = (m @ plane_mat.T) >= 0
        return pd.Series((signs @ weights).astype(np.int64))

    return _bucket(vec)


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane packed into a
    long. Probe and candidates sharing a bucket are cosine-close with high
    probability — the pruning tier for ANN search (X6) and the coarse
    quantizer for the IVF-style index."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot(vec, F.lit(plane).cast("array<double>"))
        bucket = bucket + F.when(d >= 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
    return bucket
