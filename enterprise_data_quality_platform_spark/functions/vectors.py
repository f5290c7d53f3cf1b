"""Vector column functions over ``array<float>`` embeddings (SURVEY.md §2.6
X5-X6).

Dot products / norms / cosine are expressed with higher-order functions
(``zip_with`` + ``aggregate``) so they run JVM-side inside codegen — no
Python round-trip per row. Accumulation is sequential over the array in both
Spark and DuckDB, so results are bit-comparable after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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


def l2_normalize(a: Column) -> Column:
    n = norm(a)
    return F.transform(a, lambda x: x / n)


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
