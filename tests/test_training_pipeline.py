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


def test_assign_split_deterministic_proportions(spark):
    from enterprise_data_quality_platform_spark.plans.training_data import (
        assign_split,
    )

    docs = table(spark, SF_SMALL, "documents")
    a = {r.doc_id: r.split for r in assign_split(docs).collect()}
    b = {r.doc_id: r.split for r in assign_split(docs).collect()}
    assert a == b  # deterministic
    n = len(a)
    from collections import Counter

    c = Counter(a.values())
    assert set(c) <= {"train", "val", "test"}
    assert 0.6 * n < c["train"] < 0.95 * n  # ~80% within sampling noise


def test_pack_sequences_chunking(spark):
    from enterprise_data_quality_platform_spark.plans.training_data import (
        pack_sequences,
    )
    from enterprise_data_quality_platform_spark.functions.text import token_count

    docs = table(spark, SF_SMALL, "documents").withColumn(
        "n_tokens", token_count(F.col("text")).cast("bigint")
    )
    packed = pack_sequences(docs, budget=100, num_shards=4)
    assert packed.count() == docs.count()  # every doc placed exactly once
    # offsets live inside the chunk; seq_id is the chunk the doc starts in
    assert packed.filter(
        (F.col("seq_offset") < 0) | (F.col("seq_offset") >= 100)
    ).count() == 0
    # chunk ids are dense per shard: max seq_id == ceil(total/budget) - 1
    import math

    for r in (
        packed.groupBy("shard")
        .agg(F.sum("n_tokens").alias("t"), F.max("seq_id").alias("m"))
        .collect()
    ):
        assert r.m <= math.ceil(r.t / 100) - 1 + 1  # last doc may start in final chunk


def test_pack_sequences_crafted(spark):
    from enterprise_data_quality_platform_spark.plans.training_data import (
        pack_sequences,
    )

    rows = [(0, 50), (1, 5000), (2, 60)]  # doc 1 spans 50 chunks
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: r for r in pack_sequences(df, budget=100, num_shards=1).collect()
    }
    assert len(got) == 3  # oversize doc kept, never dropped
    assert (got[0].seq_id, got[0].seq_offset, bool(got[0].straddles)) == (0, 0, False)
    assert (got[1].seq_id, got[1].seq_offset, bool(got[1].straddles)) == (0, 50, True)
    assert (got[2].seq_id, got[2].seq_offset, bool(got[2].straddles)) == (50, 50, True)


def test_repetition_stats_crafted(spark):
    from enterprise_data_quality_platform_spark.plans.training_data import (
        repetition_stats,
    )

    rows = [
        (0, "a b c d e " * 10),  # pure repetition of one 5-gram cycle
        (1, " ".join(f"w{i}" for i in range(50))),  # all distinct
        (2, "x y"),  # shorter than the gram width
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df, ngram=5).collect()}
    assert got[0].rep_ratio > 0.8
    assert got[1].rep_ratio == 0.0
    assert got[2].n_grams == 0 and got[2].rep_ratio == 0.0


def test_decontaminate_crafted(spark):
    from enterprise_data_quality_platform_spark.plans.training_data import (
        decontaminate,
    )

    bench = spark.createDataFrame(
        [(100, "the secret eval answer is forty two exactly")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "some clean document with no overlap at all here"),
            (2, "we found the secret eval answer is forty two exactly wow"),
            (3, "another clean one nothing shared with benchmarks"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.shared_grams for r in decontaminate(corpus, bench, ngram=4).collect()}
    assert set(got) == {2}
    assert got[2] >= 4  # several shared 4-grams in the leaked span


def test_chunk_tokens_boundaries(spark):
    """Window/stride arithmetic: overlap preserved, trailing short chunk
    kept, single-word and empty-ish docs produce exactly one chunk."""
    from enterprise_data_quality_platform_spark.plans.training_data import (
        chunk_tokens,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
            (2, "only"),  # 1 token
        ],
        "doc_id long, text string",
    )
    out = chunk_tokens(docs, window=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    # starts 1,4,7,10 -> 4 chunks; lengths 4,4,4,1
    assert [r.n_tokens for r in c1] == [4, 4, 4, 1]
    assert c1[0].chunk_text == "w0 w1 w2 w3"
    assert c1[1].chunk_text == "w3 w4 w5 w6"  # 1-token overlap (4-3)
    assert c1[3].chunk_text == "w9"  # trailing tail kept
    assert [r.chunk_id for r in c1] == [0, 1, 2, 3]
    c2 = by_doc[2]
    assert len(c2) == 1 and c2[0].n_tokens == 1 and c2[0].chunk_text == "only"


def test_chunk_tokens_property_coverage_and_overlap(spark):
    """Property pin (seeded generator, one Spark round-trip for all
    cases): for random docs and several (window, stride) settings, the
    chunks exactly tile the token sequence — concatenating each chunk's
    first `stride` tokens (all tokens for the last chunk) reconstructs
    the document; consecutive chunks overlap by exactly window-stride
    tokens; n_tokens matches the slice arithmetic."""
    import random

    from enterprise_data_quality_platform_spark.plans.training_data import (
        chunk_tokens,
    )

    rng = random.Random(7)
    docs, expected_words = [], {}
    did = 0
    for n_words in [1, 2, 5, 47, 48, 49, 63, 64, 65, 100, 257]:
        words = [f"w{rng.randrange(1000)}" for _ in range(n_words)]
        docs.append((did, " ".join(words)))
        expected_words[did] = words
        did += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")

    for window, stride in [(64, 48), (8, 8), (10, 3)]:
        out = chunk_tokens(df, window=window, stride=stride).collect()
        by_doc: dict[int, list] = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert set(by_doc) == set(expected_words)
        for d, rows in by_doc.items():
            rows.sort(key=lambda r: r.chunk_id)
            words = expected_words[d]
            # chunk_ids are dense 0..k-1 with starts at stride boundaries
            assert [r.chunk_id for r in rows] == list(range(len(rows)))
            recon: list[str] = []
            for i, r in enumerate(rows):
                toks = r.chunk_text.split(" ") if r.chunk_text else []
                start = i * stride
                assert toks == words[start : start + window]
                assert r.n_tokens == len(toks)
                if i + 1 < len(rows) and window > stride:
                    nxt = rows[i + 1].chunk_text.split(" ")
                    assert toks[stride:] == nxt[: window - stride]
                recon.extend(toks if i == len(rows) - 1 else toks[:stride])
            assert recon == words
