"""Exact deduplication (SURVEY.md §2.6 X3).

Two tiers:
- key dedup: ``dropDuplicates([key])`` — shuffle on the key, keep-first.
- content dedup: normalize → md5 fingerprint → dropDuplicates on the hash.
  At 100TB the shuffle carries (fingerprint, row) once; with a deterministic
  keep rule (min doc_id per fingerprint) results are stable under
  repartitioning — plain dropDuplicates keeps an arbitrary row, which is
  fine for dedup but not for reproducible pipelines, so we do the window
  form by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint


def exact_dedup(df: DataFrame, key: str) -> DataFrame:
    """Keep one row per key value (arbitrary-but-single winner)."""
    return df.dropDuplicates([key])


def fingerprint_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content dedup with a deterministic winner (lowest id per normalized
    fingerprint). One shuffle on the fingerprint."""
    w = Window.partitionBy("__fp").orderBy(F.col(id_col))
    return (
        df.withColumn("__fp", fingerprint(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )
