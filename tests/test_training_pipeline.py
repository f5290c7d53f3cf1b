"""Training-data curation funnel tests (SURVEY.md §2.6 north star)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from enterprise_data_quality_platform_spark.catalog import table
from enterprise_data_quality_platform_spark.plans.training_data import (
    corpus_stats,
    curate_documents,
)

from conftest import SF_SMALL

LONG = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm window sill and the birds sing in the garden outside "
    "as morning light spreads slowly across the quiet little town below"
)


def test_curation_removes_exact_and_near_dups(spark):
    rows = [
        Row(doc_id=0, text=LONG, lang="en", source="s", n_chars=len(LONG)),
        Row(doc_id=1, text=LONG, lang="en", source="s", n_chars=len(LONG)),  # exact dup
        Row(  # near dup of 0
            doc_id=2,
            text=LONG.replace("lazy", "sleepy"),
            lang="en",
            source="s",
            n_chars=len(LONG),
        ),
        Row(  # unique, decent quality
            doc_id=3,
            text="columnar storage with vectorized execution beats row stores "
            "for analytical scans in almost every modern benchmark suite",
            lang="en",
            source="s",
            n_chars=100,
        ),
        Row(doc_id=4, text="tiny", lang="en", source="s", n_chars=4),  # low quality
    ]
    docs = spark.createDataFrame(rows)
    curated = curate_documents(docs, quality_threshold=0.05, near_dup_threshold=0.5)
    kept = sorted(r.doc_id for r in curated.collect())
    assert 1 not in kept  # exact dup gone (higher id loses)
    assert 2 not in kept  # near dup gone
    assert 4 not in kept  # low quality gone
    assert 0 in kept and 3 in kept


def test_curation_annotations_and_stats(spark):
    docs = table(spark, SF_SMALL, "documents")
    curated = curate_documents(docs, with_near_dup=False)
    assert {"quality_score", "pred_lang", "n_tokens"} <= set(curated.columns)
    assert curated.count() <= docs.count()
    assert curated.filter(F.col("quality_score") < 0.05).count() == 0
    stats = corpus_stats(curated).collect()
    assert sum(r.n_docs for r in stats) == curated.count()
    assert all(r.total_tokens > 0 for r in stats)


def test_curation_idempotent(spark):
    docs = table(spark, SF_SMALL, "documents")
    once = curate_documents(docs, with_near_dup=False)
    twice = curate_documents(
        once.select("doc_id", "text", "lang", "source", "n_chars"),
        with_near_dup=False,
    )
    assert sorted(r.doc_id for r in once.collect()) == sorted(
        r.doc_id for r in twice.collect()
    )
