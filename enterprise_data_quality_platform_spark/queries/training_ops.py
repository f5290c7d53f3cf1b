"""Training-data curation as a declared query (SURVEY.md §2.6 north star).

The oracle-checked entry runs the SQL-expressible funnel (exact dedup →
quality filter → language ID → token budget); the full pipeline including
MinHash near-dup removal is ``plans.training_data.curate_documents``
(rows-only query + recall-tested modules)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..functions.numeric import sql_avg
from ..plans.training_data import corpus_stats, curate_documents
from .registry import register

_QUALITY_SQL = """
      CASE WHEN length(trim(text)) = 0 THEN 0
           ELSE len(string_split_regex(trim(text), '\\s+')) END"""

_ORACLE = rf"""
WITH fp AS (
  SELECT doc_id, text,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents
),
dedup AS (
  SELECT doc_id, text FROM fp
  QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
),
ann AS (
  SELECT doc_id,
         {_QUALITY_SQL} AS n_tokens,
         (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
           * 1.0 / greatest(length(text), 1) AS p_ratio,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t IN ('the','and','of','a','to','is','in','that')))
           * 1.0 / greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1) AS s_ratio,
         length(regexp_replace(text, '[\x00-\x7F]', '', 'g'))
           * 1.0 / greatest(length(text), 1) AS na_ratio,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t IN ('the','and','of','a','to','is','in','that'))) AS h_en,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t IN ('el','la','de','que','y','los','las','una'))) AS h_es,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t IN ('der','die','das','und','ist','nicht','ein','mit'))) AS h_de,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t IN ('le','la','les','des','est','une','dans','que'))) AS h_fr
  FROM dedup
),
scored AS (
  SELECT doc_id, n_tokens,
         ROUND(least(1.0, n_tokens / 200.0) * (1 - p_ratio) * (1 - s_ratio), 4) AS quality_score,
         CASE WHEN na_ratio > 0.5 THEN 'cjk'
              WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
              WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
              WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
              WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
              ELSE 'fr' END AS pred_lang
  FROM ann
),
cur AS (SELECT * FROM scored WHERE quality_score >= 0.05)
SELECT pred_lang,
       COUNT(*) AS n_docs,
       SUM(n_tokens) AS total_tokens,
       {sql_avg("quality_score")} AS avg_quality
FROM cur
GROUP BY pred_lang
ORDER BY pred_lang
"""


@register(
    "training_data_curation",
    oracle=_ORACLE,
    tables=("documents",),
)
def training_data_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel, oracle-checkable subset (no MinHash stage):
    exact dedup → quality ≥ 0.05 → language ID → per-language token budget."""
    docs = table(spark, sf_dir, "documents")
    curated = curate_documents(
        docs, quality_threshold=0.05, with_near_dup=False
    )
    return corpus_stats(curated)


@register(
    "training_data_curation_full",
    oracle=None,  # MinHash stage is engine-hash-specific → rows-only
    tables=("documents",),
)
def training_data_curation_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full funnel including MinHash-LSH near-dup removal."""
    docs = table(spark, sf_dir, "documents")
    curated = curate_documents(
        docs, quality_threshold=0.05, near_dup_threshold=0.7, with_near_dup=True
    )
    return corpus_stats(curated)
