"""n-gram Jaccard similarity pairs (SURVEY.md §2.6 X4 exact form).

The exact (non-LSH) near-dup operator: explode distinct shingles, self-join
on shingle equality, count common shingles per pair, Jaccard =
|A∩B| / (|A|+|B|-|A∩B|). SQL-expressible, hence oracle-checkable.

Scale: the shingle join shuffles (shingle, doc) — fine while shingles are
selective; stop-shingle removal (``max_doc_freq``) drops ubiquitous
shingles, which both kills skew and removes noise pairs (the standard
df-cut in near-dup mining). For corpus-scale runs prefer minhash.py and use
this only to verify candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
    n: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for all pairs with Jaccard ≥ threshold."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    sh = df.repartition(parallelism, F.col(id_col)).select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("grams")
    ).withColumn("sz", F.size("grams"))
    ex = sh.select("id", "sz", F.explode("grams").alias("gram"))
    if max_doc_freq is not None:
        freq = ex.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
        ex = ex.join(
            F.broadcast(freq.filter(F.col("df") <= max_doc_freq).drop("df")),
            on="gram",
        )
    a = ex.select(
        F.col("gram"), F.col("id").alias("id_a"), F.col("sz").alias("sz_a")
    )
    b = ex.select(
        F.col("gram"), F.col("id").alias("id_b"), F.col("sz").alias("sz_b")
    )
    pairs = (
        a.join(b, on="gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.first("sz_a").alias("sz_a"),
            F.first("sz_b").alias("sz_b"),
        )
    )
    jac = F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    return (
        pairs.select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric containment C(A,B) = |A∩B| / |A|: how much of doc A's
    shingle set lives inside doc B. The subset/superset detector Jaccard
    misses — a paragraph quoted whole inside a much longer page has high
    containment but low Jaccard (the union is dominated by the page), and
    training-data dedup wants to DROP the contained fragment while keeping
    the superset. Emits directed (id_a, id_b, containment) with
    containment of the SMALLER-set side ≥ threshold; same single
    shingle-equijoin shape (and df-cut skew guard) as
    ``ngram_jaccard_pairs``."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    sh = df.repartition(parallelism, F.col(id_col)).select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("grams")
    ).withColumn("sz", F.size("grams"))
    ex = sh.select("id", "sz", F.explode("grams").alias("gram"))
    if max_doc_freq is not None:
        freq = ex.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
        ex = ex.join(
            F.broadcast(freq.filter(F.col("df") <= max_doc_freq).drop("df")),
            on="gram",
        )
    a = ex.select("gram", F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    b = ex.select("gram", F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    pairs = (
        a.join(b, on="gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.first("sz_a").alias("sz_a"),
            F.first("sz_b").alias("sz_b"),
        )
    )
    # containment of the smaller shingle set inside the larger
    cont = F.col("common") / F.least(F.col("sz_a"), F.col("sz_b"))
    return (
        pairs.select("id_a", "id_b", F.round(cont, 4).alias("containment"))
        .filter(F.col("containment") >= threshold)
    )
