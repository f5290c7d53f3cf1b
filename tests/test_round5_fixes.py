"""Regression tests for the round-5 ADVICE fixes: runner isolation-retry
closure binding, exact packed-BIGINT division, group-quantile key typing /
NULL keys, and non-dict JSON delivery bodies."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from enterprise_data_quality_platform_spark.checks import Check, run_suite
from enterprise_data_quality_platform_spark.operators.quantiles import (
    exact_group_quantiles,
)


def test_isolation_retry_uses_own_table_frame(spark):
    """A fused factor that dies at runtime retries its members SOLO — and
    the solo frame must be the member's OWN table, not whichever table the
    loop visited last (late-binding closure bug: same column names made
    the retried check silently aggregate the wrong table)."""
    # table a: v averages 1.0 and carries the poison column (ANSI cast of
    # 'not-a-number' inside avg throws at RUNTIME, after analysis passes)
    a = spark.createDataFrame(
        [Row(v=1.0, s="not-a-number"), Row(v=1.0, s="still-not")]
    )
    # table b: same column names, wildly different values — the bug would
    # aggregate b for the retried a-check (avg 100 -> spurious fail)
    b = spark.createDataFrame([Row(v=100.0, s="9.0"), Row(v=100.0, s="9.0")])
    checks = [
        Check("poison_a", "mean_between", "a", "s", params={"min": 0, "max": 1}),
        Check("mean_a", "mean_between", "a", "v", params={"min": 0.5, "max": 1.5}),
        Check("mean_b", "mean_between", "b", "v", params={"min": 50, "max": 150}),
    ]
    results = {r.check_name: r for r in run_suite({"a": a, "b": b}, checks)}
    assert results["poison_a"].status == "error"  # the ANSI throw isolates
    # the load-bearing assertion: retried against table a, observed mean 1.0
    assert results["mean_a"].status == "pass", results["mean_a"].error_message
    assert float(results["mean_a"].observed.get("mean")) == 1.0
    assert results["mean_b"].status == "pass"


def test_packed_score_division_is_exact(spark):
    """kept_score_e4 = packed div 1e12 must use integer division: packed
    exceeds 2^53, where the float quotient rounds 9999 up to 10000 for
    small doc_ids (ADVICE r4). Mirrors dedup_keep_best_quality's select."""
    B = 1000000000000
    rows = [
        Row(packed=9999 * B + (B - 1)),  # score 9999, doc_id 1 — the trap
        Row(packed=10000 * B + (B - 5)),
        Row(packed=0 * B + (B - 7)),
    ]
    df = spark.createDataFrame(rows)
    got = [
        (r["score"], r["doc_id"])
        for r in df.select(
            F.expr(f"packed div {B}").alias("score"),
            (F.lit(B) - F.col("packed") % F.lit(B)).cast("long").alias("doc_id"),
        ).collect()
    ]
    assert got == [(9999, 1), (10000, 5), (0, 7)]


def test_group_quantiles_null_and_date_keys(spark):
    """Group keys outside {str, int} (e.g. date) and NULL group keys must
    work: schema comes from the input column's type and the joins are
    null-safe (the old isinstance-guess crashed createDataFrame / lost the
    NULL group and raised KeyError)."""
    d1 = datetime.date(2024, 1, 1)
    d2 = datetime.date(2024, 1, 2)
    rows = [Row(g=d1, v=float(i)) for i in range(1, 101)]
    rows += [Row(g=d2, v=42.0)]  # degenerate single-value group
    rows += [Row(g=None, v=float(i)) for i in range(1, 11)]  # NULL key group
    df = spark.createDataFrame(rows)
    out = {r["group"]: r for r in exact_group_quantiles(df, "g", "v", [0.5, 0.9])}
    assert out[d1]["q0.5"] == 50.5 and out[d1]["q0.9"] == pytest.approx(90.1)
    assert out[d2]["q0.5"] == 42.0
    assert out[None]["q0.5"] == 5.5 and out[None]["n_values"] == 10


def test_http_transport_accepts_json_array_body():
    """A 2xx response whose body is a JSON array (or scalar) is still a
    success — it must not raise TypeError assigning _status (ADVICE r4)."""
    from enterprise_data_quality_platform_spark.delivery import HttpTransport

    class FakeResp:
        status = 200

        def read(self):
            return json.dumps([{"id": 1}, {"id": 2}]).encode()

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    import urllib.request

    tp = HttpTransport(retries=1)
    orig = urllib.request.urlopen
    urllib.request.urlopen = lambda req, timeout=None: FakeResp()
    try:
        out = tp.post("http://example.invalid/hook", {"x": 1}, {})
    finally:
        urllib.request.urlopen = orig
    assert out["_status"] == 200
    assert out["raw"] == [{"id": 1}, {"id": 2}]


def test_approx_unique_check_fuses_and_detects_duplication(spark):
    """approx=True unique: an HLL expression in the FUSED aggregate (no
    frame_builder / per-key shuffle), passing on key-like data and failing
    on gross duplication — the 100 TB suite posture."""
    from enterprise_data_quality_platform_spark.checks.compiler import (
        compile_agg_check,
    )

    chk = Check("k unique", "unique", "t", column="k", params={"approx": True})
    compiled = compile_agg_check(chk, prefix="c0")
    assert compiled.frame_builder is None and compiled.exprs  # fuses

    unique_df = spark.range(5000).withColumnRenamed("id", "k")
    dup_df = spark.range(5000).select((F.col("id") % 10).alias("k"))
    ok = run_suite({"t": unique_df}, [chk])[0]
    bad = run_suite({"t": dup_df}, [chk])[0]
    assert ok.status == "pass", ok.observed
    assert bad.status == "fail" and bad.violations > 4000
    assert str(bad.observed["approx"]) == "True"  # observed is stringified


def test_suite_report_approx_agrees_with_exact(spark):
    """dq_suite_report_approx: same check names, same pass/fail verdicts as
    the exact suite on clean data (the sketch path must not flag phantom
    duplicates at 3*rsd tolerance)."""
    import os

    sf = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        import pytest as _pytest

        _pytest.skip("testdata missing")
    from enterprise_data_quality_platform_spark.queries import query_fns

    fns = query_fns()
    exact = {
        r["check_name"]: r["status"]
        for r in fns["dq_suite_report"](spark, sf).collect()
    }
    approx = {
        r["check_name"]: r["status"]
        for r in fns["dq_suite_report_approx"](spark, sf).collect()
    }
    assert set(exact) == set(approx)
    assert exact == approx
