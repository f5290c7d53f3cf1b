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
    docs = table(spark, sf_dir, "documents")
    docs = docs.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )  # decode parallelism must not be file-split-bound
    media = attach_fake_payloads(docs)
    feats = extract_features(media, fake=True, passthrough=("media_type",))
    return (
        feats.groupBy("media_type", "decode_status")
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
    docs = table(spark, sf_dir, "documents")
    # one pass, fully parallel: repartition ahead of the encode (the
    # documents file's few splits would otherwise bound BOTH mapInPandas
    # stages), and carry media_type through extract_features instead of
    # joining back to the media frame (the join side would re-run the
    # whole encode: 8.1 → 1.5 s at sf0.1 combined)
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    media = attach_real_payloads(docs)
    feats = extract_features(media, fake=False, passthrough=("media_type",))
    return (
        feats.groupBy("media_type", "decode_status")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            fx_round(F.avg(F.element_at("feature", 1)), 4).alias("avg_feat0"),
            fx_round(F.avg(F.element_at("feature", 4)), 4).alias("avg_feat3"),
        )
        .orderBy("media_type", "decode_status")
    )


@register(
    "multimodal_phash_neardup",
    oracle=None,  # decode + aHash are library-side; rows-only. Semantics
    # (radius recall, banding exactness) pinned in tests/test_phash.py.
    tables=("documents",),
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4×X7: perceptual-hash near-duplicate image pairs over the real-PNG
    media twin of the documents table — decode (stdlib PNG) → 64-bit
    aHash (Arrow-batched mapInPandas) → banded bucket join (no all-pairs)
    → JVM bit_count Hamming verify. Payloads are full-entropy chained-hash
    images (attach_image_payloads) so ONLY exact-duplicate documents
    collide: the hamming=0 pair count equals the sum over exact-dup
    clusters of C(size,2) (cross-checked against dedup_cluster_sizes at
    sf0.1). The summary row counts pairs by hamming distance."""
    from ..multimodal.phash import (
        attach_image_payloads,
        image_ahashes,
        phash_neardup_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    media = attach_image_payloads(docs)
    pairs = phash_neardup_pairs(image_ahashes(media))
    return (
        pairs.groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
    )
