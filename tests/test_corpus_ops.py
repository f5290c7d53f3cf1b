"""Tests for the round-3 corpus operators: balanced stratified sampling,
int8 embedding quantization, tf-idf distinctive terms, vocab coverage.

Oracle parity for the four declared queries is covered by
tests/test_parity.py (and the driver); these tests pin the *semantic*
properties the oracles can't express — determinism across layouts,
reconstruction error bounds, ranking behavior on crafted inputs."""

from __future__ import annotations

import pytest
from conftest import SF_SMALL
from pyspark.sql import functions as F

from enterprise_data_quality_platform_spark.catalog import table
from enterprise_data_quality_platform_spark.plans.training_data import (
    sample_balanced,
)
from enterprise_data_quality_platform_spark.similarity.quantize import (
    dequantize_expr,
    dim_stats,
    quantize_codes,
    quantize_vectors,
)


# ---------------------------------------------------------------- sampling


def test_sample_balanced_deterministic_across_layouts(spark):
    docs = table(spark, SF_SMALL, "documents")
    a = sample_balanced(docs).select("doc_id")
    b = sample_balanced(docs.repartition(13, "lang")).select("doc_id")
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_sample_balanced_keeps_all_of_smallest_stratum(spark):
    docs = table(spark, SF_SMALL, "documents")
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    smallest = min(counts, key=lambda s: (counts[s], s))
    kept = {
        r["source"]: r["n"]
        for r in sample_balanced(docs)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # the minimum stratum's threshold is bucket < 1000 -> keeps everything
    assert kept[smallest] == counts[smallest]
    # every stratum lands within hash noise of the target
    target = counts[smallest]
    for s, n in kept.items():
        assert n <= counts[s]
        assert abs(n - target) <= max(10, int(0.35 * target)), (s, n, target)


def test_sample_balanced_is_subset(spark):
    docs = table(spark, SF_SMALL, "documents")
    kept = sample_balanced(docs)
    assert kept.select("doc_id").subtract(docs.select("doc_id")).count() == 0


# ------------------------------------------------------------ quantization


def test_quantize_codes_in_range_and_deterministic(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    codes = quantize_codes(emb)
    bad = codes.filter((F.col("code") < 0) | (F.col("code") > 255)).count()
    assert bad == 0
    again = quantize_codes(emb.repartition(7))
    key = ["vec_id", "dim", "code"]
    assert codes.select(key).subtract(again.select(key)).count() == 0


def test_quantize_reconstruction_error_bounded(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    codes = quantize_codes(emb)
    step = (F.col("mx") - F.col("mn")) / F.lit(255.0)
    err = codes.select(
        (
            F.abs(dequantize_expr(F.col("code"), F.col("mn"), F.col("mx")) - F.col("v"))
            / step
        ).alias("rel_err")
    )
    # |reconstruction - original| <= one quantization step (floor + clamp)
    assert err.agg(F.max("rel_err")).first()[0] <= 1.0 + 1e-9


def test_quantize_vectors_roundtrip_shape(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    dims = emb.select(F.size("embedding").alias("d")).first()["d"]
    vecs = quantize_vectors(emb)
    row = vecs.filter(F.col("vec_id") == 0).first()
    assert len(row["codes"]) == dims
    assert vecs.count() == emb.count()


def test_quantize_with_frozen_stats_matches_inline(spark):
    """Calibrate-once-apply-many equals calibrate-inline on the same data."""
    emb = table(spark, SF_SMALL, "embeddings")
    frozen = dim_stats(emb)
    a = quantize_codes(emb, stats=frozen).select("vec_id", "dim", "code")
    b = quantize_codes(emb).select("vec_id", "dim", "code")
    assert a.subtract(b).count() == 0


# ------------------------------------------------------------------ tf-idf


@pytest.fixture()
def crafted_docs(spark):
    rows = [
        (1, "common common common rareword"),
        (2, "common common other"),
        (3, "common unique3 unique3"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_distinctive_term_outranks_common(spark, crafted_docs):
    """A term unique to one doc must outrank a corpus-wide term with a
    higher in-doc count: score(rareword)=1/1 > score(common)=3/3."""
    from enterprise_data_quality_platform_spark.functions import text as TX

    toks = crafted_docs.select(
        "doc_id", F.explode(TX.tokens(F.lower(F.col("text")))).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "token").withColumn("score", F.col("tf") / F.col("df"))
    doc1 = {r["token"]: r["score"] for r in scored.filter("doc_id = 1").collect()}
    assert doc1["rareword"] == 1.0  # tf 1 / df 1
    assert doc1["common"] == 1.0  # tf 3 / df 3 — tie
    doc3 = {r["token"]: r["score"] for r in scored.filter("doc_id = 3").collect()}
    assert doc3["unique3"] == 2.0  # tf 2 / df 1 beats common at 1.0
    assert doc3["unique3"] > doc3["common"]


def test_tfidf_query_topk_shape(spark):
    from enterprise_data_quality_platform_spark.queries import query_fns

    out = query_fns()["text_tfidf_terms"](spark, SF_SMALL)
    per_doc = out.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert per_doc.filter(F.col("n") > 3).count() == 0


# --------------------------------------------------------- vocab coverage


def test_vocab_coverage_monotone_and_bounded(spark):
    from enterprise_data_quality_platform_spark.queries import query_fns

    rows = (
        query_fns()["text_vocab_coverage"](spark, SF_SMALL)
        .orderBy("token_id")
        .collect()
    )
    assert rows, "vocab must be non-empty"
    ids = [r["token_id"] for r in rows]
    assert ids == list(range(1, len(rows) + 1))
    cov = [r["coverage"] for r in rows]
    assert all(b >= a for a, b in zip(cov, cov[1:]))
    assert cov[-1] <= 1.0 + 1e-12
    counts = [r["token_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)


# ------------------------------------------------------- quantized search


def test_quantized_knn_recall_vs_brute_force(spark):
    """ADC over int8 codes must agree with exact float cosine on ≥ 8 of
    top-10 neighbors per probe (int8 scalar quantization typically costs
    only tail-rank churn)."""
    from enterprise_data_quality_platform_spark.functions import vectors as V
    from enterprise_data_quality_platform_spark.similarity.knn import (
        brute_force_topk,
    )
    from enterprise_data_quality_platform_spark.similarity.quantize import (
        quantized_knn_topk,
    )

    emb = table(spark, SF_SMALL, "embeddings")
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("probe_id"),
        V.to_double(F.col("embedding")).alias("pvec"),
    )
    exact = brute_force_topk(emb, probes, k=10)
    approx = quantized_knn_topk(emb, probes, k=10)
    e = {(r["probe_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["probe_id"], r["vec_id"]) for r in approx.collect()}
    for pid in (0, 1, 2):
        ep = {v for p, v in e if p == pid}
        ap = {v for p, v in a if p == pid}
        assert len(ep & ap) >= 8, (pid, sorted(ep), sorted(ap))


def test_quantized_knn_is_arrow_vectorized(spark):
    from enterprise_data_quality_platform_spark.functions import vectors as V
    from enterprise_data_quality_platform_spark.similarity.quantize import (
        quantized_knn_topk,
    )

    emb = table(spark, SF_SMALL, "embeddings")
    probes = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("probe_id"),
        V.to_double(F.col("embedding")).alias("pvec"),
    )
    plan = quantized_knn_topk(emb, probes, k=3)._sc._jvm  # noqa: F841
    explained = quantized_knn_topk(emb, probes, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in explained


def test_mixture_sample_replication_semantics(spark):
    """rate 2500 -> 2 full replicas + 1 more for rows whose bucket < 500;
    rate 0 -> dropped; replica index is 1-based and dense."""
    from pyspark.sql import functions as F

    from enterprise_data_quality_platform_spark.plans.training_data import (
        _SAMPLE_ID_MOD,
        _SPLIT_HASH,
        mixture_sample,
    )

    docs = spark.createDataFrame(
        [(i, "s") for i in range(200)], "doc_id long, source string"
    )
    out = mixture_sample(docs, F.lit(2500)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.replica)
    assert set(by_doc) == set(range(200))  # every doc kept at rate >= 1000
    for i, reps in by_doc.items():
        bucket = ((i % _SAMPLE_ID_MOD) * _SPLIT_HASH) % 1000
        want = 3 if bucket < 500 else 2
        assert sorted(reps) == list(range(1, want + 1)), i
    # statistically ~half get the 3rd replica
    n3 = sum(1 for reps in by_doc.values() if len(reps) == 3)
    assert 60 <= n3 <= 140
    # rate 0 drops everything; rate 999 keeps a strict subset, 1 replica
    assert mixture_sample(docs, F.lit(0)).count() == 0
    sub = mixture_sample(docs, F.lit(999)).collect()
    assert 0 < len(sub) < 200 and all(r.replica == 1 for r in sub)


def test_pretoken_byte_scan_equals_regex_form(spark):
    """The numpy byte-class run counter must equal the regex class-run
    form on every edge: unicode, mixed runs, pure whitespace, empty,
    leading/trailing classes, vertical tab (Java \\s)."""
    from pyspark.sql import functions as F

    from enterprise_data_quality_platform_spark.functions.text import (
        PRETOKEN_PATTERN,
        pretoken_count_batches,
        token_count,
    )

    texts = [
        "hello world",
        "ab1cd  x,y!!z",
        "  \t\n ",
        "",
        "42",
        "naïve café — ünïcode 日本語 test",
        "a-b_c 1.5e3 ...",
        "\x0bword\x0b",
        "trailing digits 123",
        "!leading punct",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_pretokens, r.n_words, r.n_number_runs, r.n_punct_runs)
        for r in df.mapInPandas(
            pretoken_count_batches,
            schema="doc_id long, n_pretokens long, n_words long,"
            " n_number_runs long, n_punct_runs long",
        ).collect()
    }
    t = F.col("text")
    want = {
        r.doc_id: (r.a, r.b, r.c, r.d)
        for r in df.select(
            "doc_id",
            F.size(F.regexp_extract_all(t, F.lit(PRETOKEN_PATTERN), 0))
            .cast("long").alias("a"),
            token_count(t).cast("long").alias("b"),
            F.size(F.regexp_extract_all(t, F.lit(r"[0-9]+"), 0))
            .cast("long").alias("c"),
            F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]+"), 0))
            .cast("long").alias("d"),
        ).collect()
    }
    assert got == want


# ------------------------------------------------- boilerplate n-grams


def test_boilerplate_ngrams_crafted(spark):
    """Within-doc repetition counts ONCE (distinct grams per doc); the
    doc-frequency threshold and (df desc, gram) ordering are exact."""
    from enterprise_data_quality_platform_spark.functions import text as TX

    rows = [
        (1, "all rights reserved here all rights reserved"),  # dup gram in-doc
        (2, "all rights reserved elsewhere"),
        (3, "prefix all rights reserved"),
        (4, "no shared phrase at all"),
        (5, "short text"),  # < 3 tokens after split -> no grams
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ex = docs.select(F.explode(TX.shingles(F.col("text"), 3)).alias("gram"))
    out = (
        ex.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= 3)
        .orderBy(F.col("doc_freq").desc(), "gram")
        .collect()
    )
    assert [(r["gram"], r["doc_freq"]) for r in out] == [
        ("all rights reserved", 3)
    ]


# ------------------------------------------------------ grouped top-k


def test_topk_per_group_strategies_agree(spark):
    """Two-level and one-window grouped top-k return identical rows on a
    skewed input (one hot group), and exactly k per big-enough group with
    the deterministic tiebreak order."""
    from enterprise_data_quality_platform_spark.operators.topk import (
        topk_per_group,
        topk_per_group_window,
    )

    rows = [("hot", i % 7, i) for i in range(5000)] + [
        ("cold", i, 10000 + i) for i in range(3)
    ]
    df = spark.createDataFrame(rows, ["grp", "score", "uid"]).repartition(16)
    order = [F.col("score").desc(), F.col("uid")]
    a = topk_per_group(df, ["grp"], order, k=5)
    b = topk_per_group_window(df, ["grp"], order, k=5)
    ra = sorted((r.grp, r.score, r.uid, r.rank) for r in a.collect())
    rb = sorted((r.grp, r.score, r.uid, r.rank) for r in b.collect())
    assert ra == rb and len(ra) == 5 + 3
    hot = [t for t in ra if t[0] == "hot"]
    # top-5 of the hot group: score 6 rows have uids 6,13,20,27,34 — the
    # unique-uid tiebreak makes the winners exact
    assert [t[2] for t in hot] == [6, 13, 20, 27, 34]


def test_topk_requires_order_columns(spark):
    from enterprise_data_quality_platform_spark.operators.topk import (
        topk_per_group,
    )
    import pytest as _pytest

    df = spark.range(5).withColumn("g", F.lit("a"))
    with _pytest.raises(ValueError):
        topk_per_group(df, ["g"], [], k=2)


def test_exact_rerank_recall_and_score_exactness(spark):
    """The two-stage rerank tier (ADC shortlist -> exact cosine re-rank):
    (1) recall vs full brute force >= 0.95 over the probe set at a fixed
    exact-compute budget (shortlist=50 per probe); (2) the re-ranked
    scores are EXACTLY the brute-force scores for the ids both return
    (stage 2 is full precision, not an approximation)."""
    from enterprise_data_quality_platform_spark.functions import vectors as V
    from enterprise_data_quality_platform_spark.similarity.knn import (
        brute_force_topk,
    )
    from enterprise_data_quality_platform_spark.similarity.quantize import (
        quantized_rerank_topk,
    )

    emb = table(spark, SF_SMALL, "embeddings")
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("probe_id"),
        V.to_double(F.col("embedding")).alias("pvec"),
    )
    exact = {
        (r["probe_id"], r["vec_id"]): r["cosine_sim"]
        for r in brute_force_topk(emb, probes, k=10).collect()
    }
    rerank = {
        (r["probe_id"], r["vec_id"]): r["cosine_sim"]
        for r in quantized_rerank_topk(emb, probes, k=10, shortlist=50).collect()
    }
    hits = len(set(exact) & set(rerank))
    assert hits >= 0.95 * len(exact), (hits, len(exact))
    for key in set(exact) & set(rerank):
        assert rerank[key] == exact[key]  # bit-identical full-precision


def test_exact_rerank_composes_with_lsh_candidates(spark):
    """exact_rerank over LSH bucket candidates returns exactly the
    LSH result (both score full precision) — proving the stage-2 API
    composes with any stage-1 candidate generator."""
    from enterprise_data_quality_platform_spark.functions import vectors as V
    from enterprise_data_quality_platform_spark.similarity.knn import (
        exact_rerank,
        lsh_ann_topk,
    )

    emb = table(spark, SF_SMALL, "embeddings")
    probes = emb.filter(F.col("vec_id").isin(0, 1)).select(
        F.col("vec_id").alias("probe_id"),
        V.to_double(F.col("embedding")).alias("pvec"),
    )
    lsh = lsh_ann_topk(emb, probes, k=20, num_planes=6, multiprobe=6, radius=2)
    rr = exact_rerank(emb, lsh.select("probe_id", "vec_id"), probes, k=20)
    a = {(r["probe_id"], r["vec_id"], r["cosine_sim"]) for r in lsh.collect()}
    b = {(r["probe_id"], r["vec_id"], r["cosine_sim"]) for r in rr.collect()}
    assert a == b


def test_quantize_vectors_expr_matches_join_path(spark):
    """r11: the shuffle-free expression quantizer must emit codes
    BIT-IDENTICAL to quantize_vectors' posexplode/join/regroup path —
    quantized_knn_topk switched to it, so ADC rankings hinge on this."""
    from enterprise_data_quality_platform_spark.similarity.quantize import (
        dim_stats,
        quantize_vectors_expr,
    )

    emb = table(spark, SF_SMALL, "embeddings")
    srows = dim_stats(emb).orderBy("dim").collect()
    old = {r["vec_id"]: list(r["codes"]) for r in quantize_vectors(emb).collect()}
    new = {
        r["vec_id"]: list(r["codes"])
        for r in quantize_vectors_expr(emb, srows).collect()
    }
    assert old == new
    # and the expression plan is exchange-free (the point of the twin)
    plan = (
        quantize_vectors_expr(emb, srows)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
