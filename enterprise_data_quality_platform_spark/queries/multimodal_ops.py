"""Multimodal pipeline queries (SURVEY.md §2.6 X7) — rows-only (decode +
mapInPandas plumbing have no SQL twin; schema/determinism asserted in
tests/test_multimodal_alerts.py and tests/test_codecs.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.numeric import fx_round
from ..multimodal import (
    attach_fake_payloads,
    attach_real_payloads,
    extract_features,
)
from .registry import register


@register(
    "multimodal_features",
    oracle=None,
    tables=("documents",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: binary payload column → Arrow-batched mapInPandas feature
    extraction (stub decoder) → per-media-type profile. Exercises the full
    multimodal plumbing: schema, batching, per-row error capture."""
    media = attach_fake_payloads(table(spark, sf_dir, "documents"))
    feats = extract_features(media, fake=True)
    joined = feats.join(media.select("media_id", "media_type"), on="media_id")
    return (
        joined.groupBy("media_type", "decode_status")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            fx_round(F.avg(F.element_at("feature", 1)), 4).alias("avg_feat0"),
        )
        .orderBy("media_type", "decode_status")
    )


@register(
    "multimodal_decode_real",
    oracle=None,  # real PNG/WAV decode has no SQL twin — rows-only
    tables=("documents",),
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 with REAL decode: documents → actual PNG/WAV payloads
    (attach_real_payloads) → fake=False feature extraction through the
    stdlib codecs (full PNG inflate+unfilter, PCM WAV decode) → per-type
    profile. Every row must decode ok — an 'error:' status surfacing here
    means a codec regression, not a corrupt input."""
    media = attach_real_payloads(table(spark, sf_dir, "documents"))
    feats = extract_features(media, fake=False)
    joined = feats.join(media.select("media_id", "media_type"), on="media_id")
    return (
        joined.groupBy("media_type", "decode_status")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            fx_round(F.avg(F.element_at("feature", 1)), 4).alias("avg_feat0"),
            fx_round(F.avg(F.element_at("feature", 4)), 4).alias("avg_feat3"),
        )
        .orderBy("media_type", "decode_status")
    )
