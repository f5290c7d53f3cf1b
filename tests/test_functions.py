"""Function-level tests: G10 strftime checks, R19 pandas_udf parity with the
JVM path, text/vector helpers."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from enterprise_data_quality_platform_spark.catalog import table
from enterprise_data_quality_platform_spark.checks import Check, run_suite
from enterprise_data_quality_platform_spark.functions import text as TX
from enterprise_data_quality_platform_spark.functions import vectors as V
from enterprise_data_quality_platform_spark.functions.custom_udf import (
    quality_score_pandas,
)

from conftest import SF_SMALL


def test_match_strftime_check(spark):
    """G10: timestamp-format compliance via try_to_timestamp."""
    df = spark.createDataFrame(
        [
            Row(ts="2025-09-19 14:09:00"),
            Row(ts="2025-09-19T14:09:00Z"),  # wrong format
            Row(ts="not a date"),
            Row(ts=None),  # nulls skipped (not_null's job)
        ]
    )
    results = run_suite(
        {"t": df},
        [
            Check(
                "ts format",
                "match_strftime",
                "t",
                column="ts",
                params={"format": "yyyy-MM-dd HH:mm:ss"},
            )
        ],
    )
    assert results[0].violations == 2
    assert results[0].total == 4


def test_pandas_udf_matches_jvm_quality_score(spark):
    """R19: the Arrow-batched escape hatch computes EXACTLY what the JVM
    expression computes — drop-in equivalence, not approximation."""
    docs = table(spark, SF_SMALL, "documents").limit(200)
    both = docs.select(
        "doc_id",
        TX.quality_score(F.col("text")).alias("jvm"),
        quality_score_pandas(F.col("text")).alias("vectorized"),
    ).collect()
    for r in both:
        assert r.jvm == pytest.approx(r.vectorized, abs=1e-12), r.doc_id


def test_lang_id_basics(spark):
    df = spark.createDataFrame(
        [
            Row(t="the cat and the dog in that house"),
            Row(t="el perro y la casa de los gatos"),
            Row(t="der hund und die katze ist nicht da"),
            Row(t="le chien est dans la maison des chats"),
            Row(t="中文文本内容测试样例"),
            Row(t="zzz qqq xxx"),
        ]
    )
    got = [r.lang for r in df.select(TX.lang_id(F.col("t")).alias("lang")).collect()]
    assert got == ["en", "es", "de", "fr", "cjk", "und"]


def test_shingles_and_fingerprint(spark):
    df = spark.createDataFrame([Row(t="a b c d"), Row(t="  A   b  C d  "), Row(t="x")])
    out = df.select(
        TX.shingles(F.col("t"), 3).alias("sh"),
        TX.fingerprint(F.col("t")).alias("fp"),
        TX.token_count(F.col("t")).alias("tc"),
    ).collect()
    assert out[0].sh == ["a b c", "b c d"]
    assert out[0].fp == out[1].fp  # case/whitespace-normalized
    assert out[2].sh == []  # shorter than n
    assert [r.tc for r in out] == [4, 4, 1]


def test_vector_helpers(spark):
    df = spark.createDataFrame([Row(a=[3.0, 4.0], b=[4.0, 3.0])])
    r = df.select(
        V.dot(F.col("a"), F.col("b")).alias("dot"),
        V.norm(F.col("a")).alias("norm"),
        V.cosine(F.col("a"), F.col("b")).alias("cos"),
        V.l2_normalize(F.col("a")).alias("unit"),
    ).collect()[0]
    assert r.dot == 24.0
    assert r.norm == 5.0
    assert r.cos == pytest.approx(24.0 / 25.0)
    assert r.unit == pytest.approx([0.6, 0.8])


def test_hyperplane_bucket_deterministic(spark):
    emb = table(spark, SF_SMALL, "embeddings").limit(20)
    planes = [[1.0] * 64, [-1.0] * 64, [1.0, -1.0] * 32]
    vec = V.to_double(F.col("embedding"))
    a = emb.select(V.hyperplane_bucket(vec, planes).alias("b")).collect()
    b = emb.select(V.hyperplane_bucket(vec, planes).alias("b")).collect()
    assert a == b
    assert all(0 <= r.b < 8 for r in a)
