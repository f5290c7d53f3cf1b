"""Tests for the seventeenth-pass operators: Z-order (Morton) layout and
mergeable HLL distinct sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL

from enterprise_data_quality_platform_spark.operators import (
    interleave_bits,
    zorder_by,
)
from enterprise_data_quality_platform_spark.queries import all_queries

SPECS = all_queries()


def plan_of(spark, name: str) -> str:
    df = SPECS[name].fn(spark, SF_SMALL)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


# ------------------------------------------------------------ bit interleave


def test_interleave_bits_known_values(spark):
    # a=0b101 (bits at 0,2 -> result bits 0,4), b=0b011 (bits 0,1 ->
    # result bits 1,3) => z = 1 + 16 + 2 + 8 = 27
    df = spark.createDataFrame([(5, 3)], "a long, b long").select(
        interleave_bits(F.col("a"), F.col("b")).alias("z")
    )
    assert df.collect()[0].z == 27


def test_interleave_bits_matches_python_oracle(spark):
    rows = [(a, b) for a in range(0, 256, 37) for b in range(0, 256, 41)]
    df = spark.createDataFrame(rows, "a long, b long").select(
        "a", "b", interleave_bits(F.col("a"), F.col("b")).alias("z")
    )

    def morton(a, b):
        return sum(
            (((a >> i) & 1) << (2 * i)) + (((b >> i) & 1) << (2 * i + 1))
            for i in range(8)
        )

    for r in df.collect():
        assert r.z == morton(r.a, r.b)


def test_zorder_by_bounds_both_dimensions(spark):
    """After zorder_by, each partition covers a bounded rectangle of
    (a, b) space — BOTH per-partition ranges must be far smaller than the
    global range (the property a linear sort gives only its prefix key)."""
    import itertools

    rows = [(a, b) for a, b in itertools.product(range(64), range(64))]
    df = spark.createDataFrame(rows, "a long, b long")
    zed = zorder_by(df, F.col("a"), F.col("b"), bits=6, num_partitions=16)
    spans = (
        zed.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("a") - F.min("a")).alias("span_a"),
            (F.max("b") - F.min("b")).alias("span_b"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sum(r.n for r in spans) == 64 * 64
    # 16 partitions over a 64x64 grid: each z-contiguous chunk spans at
    # most half the global range on each axis (perfect quadrant = 16)
    for r in spans:
        if r.n >= 64:  # skip tiny boundary slivers
            assert r.span_a <= 32 and r.span_b <= 32, (r.span_a, r.span_b)


def test_zorder_locality_no_udf(spark):
    plan = plan_of(spark, "events_zorder_locality")
    assert "Python" not in plan  # bit math stays in codegen
    assert "Window" not in plan


# ---------------------------------------------------------------- HLL sketch


def test_distinct_sketch_error_band_and_merge(spark):
    row = SPECS["dq_distinct_sketch"].fn(spark, SF_SMALL).collect()[0]
    assert row.exact_distinct > 0
    # lgK=12 HLL: relative standard error ~1.6%; allow 5%
    assert row.rel_error_pct < 5.0
    # the union of per-half sketches must agree with the whole-table
    # sketch (same lgK; merge is where the incremental pattern lives)
    assert (
        abs(row.merged_estimate - row.sketch_estimate)
        <= 0.01 * row.sketch_estimate
    )


def test_hll_union_is_order_insensitive(spark):
    """Sketch algebra sanity: merging [evens, odds] and [odds, evens]
    yields identical estimates — the property that makes per-partition
    sketches safe to fold in any shuffle order."""
    df = spark.range(0, 5000).select(
        (F.col("id") % 2).alias("h"), (F.col("id") % 1300).alias("v")
    )
    sk = df.groupBy("h").agg(F.hll_sketch_agg("v", F.lit(12)).alias("sk"))
    asc = sk.orderBy("h").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0].e
    desc = sk.orderBy(F.col("h").desc()).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0].e
    assert asc == desc


# ---------------------------------------------------------- perplexity proxy


def test_perplexity_proxy_known_corpus(spark, monkeypatch):
    """Crafted corpus with known unigram probs: p(a)=3/6, p(b)=2/6,
    p(c)=1/6. Doc scores are exact means of 6-dp-rounded surprisals."""
    import math

    import enterprise_data_quality_platform_spark.queries.text as tx

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c")], "doc_id long, text string"
    )
    monkeypatch.setattr(tx, "table", lambda s, d, n: docs)
    rows = {r.doc_id: r for r in tx.text_perplexity_proxy(spark, "x").collect()}

    def micro(p):
        return math.floor(-math.log(p) * 1e6 + 0.5)

    d1 = (2 * micro(3 / 6) + micro(2 / 6)) / 3 / 1e6
    d2 = (micro(3 / 6) + micro(2 / 6) + micro(1 / 6)) / 3 / 1e6
    assert rows[1].n_toks == 3 and rows[2].n_toks == 3
    assert rows[1].avg_nll == math.floor(d1 * 1e4 + 0.5) / 1e4
    assert rows[2].avg_nll == math.floor(d2 * 1e4 + 0.5) / 1e4
    # the rare-token doc must score strictly higher
    assert rows[2].avg_nll > rows[1].avg_nll


def test_perplexity_proxy_reuses_token_pass(spark):
    """The tf frame feeds three consumers (join, vocab, total); AQE must
    reuse its shuffle so the explode pass runs once at runtime."""
    import re

    df = SPECS["text_perplexity_proxy"].fn(spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert len(re.findall(r"\(\d+\) ReusedExchange", plan)) >= 2
