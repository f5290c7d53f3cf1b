"""Training-data curation pipeline (SURVEY.md §2.6 north star).

The composition the extension operators exist for: take a raw document
corpus and produce a deduplicated, quality-filtered, language-tagged,
token-budgeted training set — the standard LLM-corpus curation funnel, each
stage a first-class engine operator:

    raw documents
      → exact dedup            (normalized-fingerprint, deterministic winner)
      → near-dup removal       (MinHash-LSH verified pairs → connected
                                components → keep min-id per cluster)
      → quality filter         (length/punct/stopword composite ≥ threshold)
      → language ID            (marker-vote heuristic; keep allowed langs)
      → token accounting       (whitespace tokenizer; corpus budget stats)

Every stage is a DataFrame→DataFrame function; at 100TB the only shuffles
are the fingerprint groupBy and the MinHash band join — the quality/lang
stages are narrow (scan-fused)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup import fingerprint_dedup, keep_one_per_cluster, minhash_near_dup_pairs
from ..functions import text as TX


def curate_documents(
    docs: DataFrame,
    quality_threshold: float = 0.05,
    allowed_langs: tuple[str, ...] | None = None,
    near_dup_threshold: float = 0.7,
    with_near_dup: bool = True,
) -> DataFrame:
    """Full curation funnel; returns the curated frame with per-doc
    quality/lang/token columns attached (so downstream sampling can weight
    on them without recomputing)."""
    # 1. exact dedup (content fingerprint, lowest-id winner)
    deduped = fingerprint_dedup(docs)

    # 2. near-dup removal: resolve pair graph to clusters, keep the
    # canonical (min-id) member of each — per-pair dropping of id_b would
    # keep multiple members of a chained cluster (A~C, B~C drops only C)
    if with_near_dup:
        pairs = minhash_near_dup_pairs(deduped, threshold=near_dup_threshold)
        deduped = keep_one_per_cluster(deduped, pairs)

    # 3-5. narrow annotate + filter (single scan)
    t = F.col("text")
    annotated = deduped.withColumns(
        {
            "quality_score": TX.quality_score(t),
            "pred_lang": TX.lang_id(t),
            "n_tokens": TX.token_count(t).cast("bigint"),
        }
    )
    curated = annotated.filter(F.col("quality_score") >= quality_threshold)
    if allowed_langs is not None:
        curated = curated.filter(F.col("pred_lang").isin(list(allowed_langs)))
    return curated


def corpus_stats(curated: DataFrame) -> DataFrame:
    """Budget report: docs/tokens/quality per predicted language."""
    from ..functions.numeric import fx_avg

    return (
        curated.groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            fx_avg(F.col("quality_score"), "avg_quality"),
        )
        .orderBy("pred_lang")
    )
