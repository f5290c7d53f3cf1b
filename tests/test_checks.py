"""Unit tests for the check compiler/runner (SURVEY.md §5.2.2-5.2.3).

The 4-record fixture mirrors the reference's only golden test — the embedded
``main()`` in ``/root/reference/analysis.md:9``: 3 valid-region records + 1
whitelist violation + 1 negative value + 1 missing field.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from enterprise_data_quality_platform_spark.checks import (
    Check,
    gate,
    run_suite,
    suite_report_df,
)
from enterprise_data_quality_platform_spark.checks.runner import (
    ValidationGateError,
    summarize,
)

AUTHORIZED_REGIONS = ("North America", "Europe", "Asia Pacific")


@pytest.fixture(scope="module")
def sample(spark):
    # analysis.md:9 shape: region/timestamp/value records
    rows = [
        Row(region="North America", timestamp="2025-09-19T14:09:00Z", value=100.0),
        Row(region="Europe", timestamp="2025-09-19T14:10:00Z", value=200.0),
        Row(region="South America", timestamp="2025-09-19T14:11:00Z", value=50.0),
        Row(region="Asia Pacific", timestamp="2025-09-19T14:12:00Z", value=-10.0),
        Row(region="Europe", timestamp=None, value=None),
    ]
    return {"metrics": spark.createDataFrame(rows)}


def _suite():
    return [
        Check("non-empty", "row_count_between", "metrics", params={"min": 1}),
        Check(
            "region whitelist",
            "values_in_set",
            "metrics",
            column="region",
            params={"values": AUTHORIZED_REGIONS},
        ),
        Check(
            "value non-negative",
            "values_between",
            "metrics",
            column="value",
            params={"min": 0},
        ),
        Check("timestamp present", "not_null", "metrics", column="timestamp"),
    ]


def test_suite_results(sample):
    results = run_suite(sample, _suite())
    by_name = {r.check_name: r for r in results}
    assert by_name["non-empty"].status == "pass"
    wl = by_name["region whitelist"]
    assert wl.status == "fail" and wl.violations == 1
    assert "South America" in wl.observed["sample"]
    assert by_name["value non-negative"].violations == 1
    assert by_name["timestamp present"].violations == 1


def test_mostly_threshold(sample):
    results = run_suite(
        sample,
        [
            Check(
                "mostly ok",
                "values_in_set",
                "metrics",
                column="region",
                params={"values": AUTHORIZED_REGIONS},
                mostly=0.75,
            )
        ],
    )
    assert results[0].status == "pass"  # 4/5 = 0.8 >= 0.75


def test_per_check_isolation(sample):
    """One broken check (bad column) must not kill the suite
    (pager-workflow.py:158-233 semantics)."""
    checks = _suite() + [
        Check("broken", "not_null", "metrics", column="no_such_column")
    ]
    results = run_suite(sample, checks)
    by_name = {r.check_name: r for r in results}
    assert by_name["broken"].status == "error"
    assert by_name["non-empty"].status == "pass"  # others unaffected
    assert len(results) == len(checks)


def test_gate_raises(sample):
    results = run_suite(sample, _suite())
    with pytest.raises(ValidationGateError) as exc:
        gate(results)
    assert "region whitelist" in str(exc.value)
    summary = summarize(results)
    assert summary["overall_status"] == "fail"
    assert summary["passed"] == 1


def test_report_df(spark, sample):
    results = run_suite(sample, _suite())
    report = suite_report_df(spark, results)
    assert report.count() == 4
    assert set(report.columns) >= {"check_name", "status", "violations", "run_ts"}


def test_metric_checks(spark, sample):
    results = run_suite(
        sample,
        [
            Check(
                "mean in range",
                "mean_between",
                "metrics",
                column="value",
                params={"min": 0, "max": 200},
            ),
            Check(
                "quantile median",
                "quantile_between",
                "metrics",
                column="value",
                params={"quantile": 0.5, "min": 0},
            ),
            Check("value unique", "unique", "metrics", column="value"),
        ],
    )
    by_name = {r.check_name: r for r in results}
    assert by_name["mean in range"].status == "pass"
    assert by_name["quantile median"].status == "pass"
    assert by_name["value unique"].status == "pass"


def test_schema_checks(spark, sample):
    results = run_suite(
        sample,
        [
            Check("has region", "column_exists", "metrics", column="region"),
            Check("no ghost col", "column_exists", "metrics", column="ghost"),
            Check(
                "value is double",
                "column_of_type",
                "metrics",
                column="value",
                params={"type": "double"},
            ),
        ],
    )
    assert [r.status for r in results] == ["pass", "fail", "pass"]


def test_correlation_approx_agrees_with_exact(spark):
    """dq_correlation_approx (double moments, the scale path) must agree
    with the exact DECIMAL path to 1e-9 relative on r and slope."""
    from conftest import SF_SMALL

    from enterprise_data_quality_platform_spark.queries.dq import (
        dq_correlation,
        dq_correlation_approx,
    )

    exact = dq_correlation(spark, SF_SMALL).collect()[0]
    approx = dq_correlation_approx(spark, SF_SMALL).collect()[0]
    assert approx.n == exact.n
    assert abs(approx.pearson_r - exact.pearson_r) <= 1e-9 * abs(exact.pearson_r)
    assert abs(approx.slope - exact.slope) <= 1e-9 * abs(exact.slope)
