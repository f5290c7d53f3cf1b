"""Round-2 hardening tests: NULL semantics of uniqueness checks, strftime
translation, in-plan KL, GE suite round-trips, cycle detection, quarantine
sink, incremental materialization."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from enterprise_data_quality_platform_spark.checks import Check, run_suite
from enterprise_data_quality_platform_spark.checks.compiler import strftime_to_spark
from enterprise_data_quality_platform_spark.checks.suite_io import (
    check_from_dict,
    check_to_dict,
    load_suite,
    save_suite,
)
from enterprise_data_quality_platform_spark.plans.orchestration import Pipeline
from enterprise_data_quality_platform_spark.sources.writers import (
    materialize_incremental,
    write_violations,
)


# ---------------------------------------------------------------------------
# unique / compound_unique under NULLs (ADVICE: struct(NULL) is non-null, so
# bare count_distinct(struct) counted NULL tuples and shifted violations)
# ---------------------------------------------------------------------------


def _unique_violations(spark, values, check_type="unique", columns=()):
    df = spark.createDataFrame([Row(a=v) for v in values], "a int")
    check = (
        Check("u", "unique", "t", column="a")
        if check_type == "unique"
        else Check("u", "compound_unique", "t", columns=columns)
    )
    [r] = run_suite({"t": df}, [check])
    return r


def test_unique_dup_plus_null(spark):
    # [1, 1, NULL]: the duplicate must count; the NULL row is skipped
    r = _unique_violations(spark, [1, 1, None])
    assert r.status == "fail" and r.violations == 1


def test_unique_all_distinct_plus_null(spark):
    # [1, 2, 3, NULL]: no duplicates — violations must be 0, never -1
    r = _unique_violations(spark, [1, 2, 3, None])
    assert r.status == "pass" and r.violations == 0


def test_compound_unique_null_fields(spark):
    rows = [
        Row(a=1, b="x"),
        Row(a=1, b="x"),  # real duplicate
        Row(a=2, b=None),
        Row(a=2, b=None),  # NULL-keyed rows are skipped, not duplicates
        Row(a=3, b="y"),
    ]
    df = spark.createDataFrame(rows)
    [r] = run_suite(
        {"t": df}, [Check("cu", "compound_unique", "t", columns=("a", "b"))]
    )
    assert r.violations == 1


# ---------------------------------------------------------------------------
# strftime → Spark pattern translation
# ---------------------------------------------------------------------------


def test_strftime_translation():
    assert strftime_to_spark("%Y-%m-%d") == "yyyy-MM-dd"
    assert strftime_to_spark("%Y-%m-%dT%H:%M:%S") == "yyyy-MM-dd'T'HH:mm:ss"
    assert strftime_to_spark("yyyy-MM-dd") == "yyyy-MM-dd"  # passthrough
    with pytest.raises(ValueError):
        strftime_to_spark("%Q")


def test_match_strftime_with_ge_format(spark):
    df = spark.createDataFrame(
        [Row(d="2025-01-01"), Row(d="2025-02-30"), Row(d="not a date")]
    )
    [r] = run_suite(
        {"t": df},
        [
            Check(
                "dates",
                "match_strftime",
                "t",
                column="d",
                params={"format": "%Y-%m-%d"},
            )
        ],
    )
    # 2025-02-30 is invalid, "not a date" unparseable → 2 violations
    assert r.violations == 2 and r.total == 3


# ---------------------------------------------------------------------------
# in-plan KL divergence — high-cardinality column must not ship a histogram
# to the driver (old form collected the whole groupBy)
# ---------------------------------------------------------------------------


def test_kl_divergence_high_cardinality(spark):
    df = spark.range(5000).select(F.col("id").alias("k"))
    [r] = run_suite(
        {"t": df},
        [
            Check(
                "kl",
                "kl_divergence_less_than",
                "t",
                column="k",
                params={
                    "expected_distribution": {"0": 0.5, "1": 0.5},
                    "threshold": 0.1,
                },
            )
        ],
    )
    # the point: it executes in-plan (no driver histogram) and reports
    # a finite KL over the expected support, even at high cardinality
    assert r.error_message is None
    assert r.total == 5000


def test_kl_divergence_skew_fails(spark):
    rows = [Row(t="a")] * 99 + [Row(t="b")]
    df = spark.createDataFrame(rows)
    [r] = run_suite(
        {"t": df},
        [
            Check(
                "kl",
                "kl_divergence_less_than",
                "t",
                column="t",
                params={
                    "expected_distribution": {"a": 0.5, "b": 0.5},
                    "threshold": 0.1,
                },
            )
        ],
    )
    assert r.status == "fail"
    assert float(r.observed["kl_divergence"]) > 0.5


def test_kl_divergence_uniform_pass(spark):
    rows = [Row(t=x) for x in ("a", "b", "c", "d", "e") * 20]
    df = spark.createDataFrame(rows)
    [r] = run_suite(
        {"t": df},
        [
            Check(
                "kl",
                "kl_divergence_less_than",
                "t",
                column="t",
                params={
                    "expected_distribution": {k: 0.2 for k in "abcde"},
                    "threshold": 0.01,
                },
            )
        ],
    )
    assert r.status == "pass"
    assert float(r.observed["kl_divergence"]) == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# GE suite round-trips (ADVICE: column_list / column_A/column_B were lost)
# ---------------------------------------------------------------------------


def test_columns_match_list_roundtrip(tmp_path, spark):
    check = Check(
        "ordered cols",
        "columns_match_list",
        "t",
        params={"column_list": ["a", "b"]},
    )
    path = str(tmp_path / "suite.json")
    save_suite([check], path)
    [loaded] = load_suite(path)
    assert loaded.params["column_list"] == ["a", "b"]
    df = spark.createDataFrame([Row(a=1, b=2)])
    [r] = run_suite({"t": df}, [loaded])
    assert r.status == "pass"


def test_pair_greater_than_roundtrip_ge_kwargs(spark):
    # a real GE suite spells the pair as column_A / column_B
    d = {
        "expectation_type": "expect_column_pair_values_a_to_be_greater_than_b",
        "kwargs": {"column_A": "hi", "column_B": "lo"},
        "meta": {"name": "pair", "table": "t"},
    }
    check = check_from_dict(d)
    assert check.columns == ("hi", "lo")
    df = spark.createDataFrame([Row(hi=2, lo=1), Row(hi=0, lo=1)])
    [r] = run_suite({"t": df}, [check])
    assert r.violations == 1
    # and back out: column_A/column_B kwargs are preserved
    out = check_to_dict(check)
    assert out["kwargs"]["column_A"] == "hi" and out["kwargs"]["column_B"] == "lo"


# ---------------------------------------------------------------------------
# orchestration: dependency cycles raise instead of busy-spinning
# ---------------------------------------------------------------------------


def test_pipeline_cycle_raises():
    p = (
        Pipeline()
        .add("a", lambda ctx: 1, upstream=("b",))
        .add("b", lambda ctx: 2, upstream=("a",))
    )
    with pytest.raises(ValueError, match="cycle"):
        p.run()


def test_pipeline_self_dependency_raises():
    p = Pipeline().add("a", lambda ctx: 1, upstream=("a",))
    with pytest.raises(ValueError, match="cycle"):
        p.run()


def test_pipeline_cycle_after_valid_stages():
    log = []
    p = (
        Pipeline()
        .add("ok", lambda ctx: log.append("ok"))
        .add("x", lambda ctx: 1, upstream=("y", "ok"))
        .add("y", lambda ctx: 2, upstream=("x",))
    )
    with pytest.raises(ValueError, match="cycle"):
        p.run()
    assert log == ["ok"]  # acyclic prefix still ran


# ---------------------------------------------------------------------------
# quarantine sink: full violating-row set, exactly
# ---------------------------------------------------------------------------


def test_write_violations_quarantine(tmp_path, spark):
    rows = [Row(region=r, value=float(i)) for i, r in enumerate(
        ["North America", "Europe", "South America", "Antarctica", "Europe"]
    )]
    df = spark.createDataFrame(rows)
    check = Check(
        "whitelist",
        "values_in_set",
        "t",
        column="region",
        params={"values": ("North America", "Europe")},
    )
    path = str(tmp_path / "quarantine")
    write_violations(df, check, path)
    back = spark.read.parquet(path)
    got = sorted(r["region"] for r in back.collect())
    assert got == ["Antarctica", "South America"]  # complete, not sampled
    assert set(back.columns) >= {"region", "value", "__check_name", "__run_ts"}


# ---------------------------------------------------------------------------
# incremental materialization: one partition rewritten, others untouched
# ---------------------------------------------------------------------------


def test_materialize_incremental_one_partition(tmp_path, spark):
    path = str(tmp_path / "mart")
    full = spark.createDataFrame(
        [
            Row(d="2025-01-01", v=1),
            Row(d="2025-01-02", v=2),
        ]
    ).withColumn("d", F.to_date("d"))
    materialize_incremental(spark, full, path, date_col="d")

    # re-run ONLY day 2 with a new value
    day2 = spark.createDataFrame([Row(d="2025-01-02", v=99)]).withColumn(
        "d", F.to_date("d")
    )
    out = materialize_incremental(spark, day2, path, date_col="d")
    got = {(str(r["p_date"]), r["v"]) for r in out.collect()}
    # day 1 untouched, day 2 replaced (not appended)
    assert got == {("2025-01-01", 1), ("2025-01-02", 99)}


# ---------------------------------------------------------------------------
# new GE-gallery check types (round 2 coverage widening)
# ---------------------------------------------------------------------------


def test_pair_equal_check(spark):
    df = spark.createDataFrame([Row(a=1, b=1), Row(a=2, b=3), Row(a=None, b=1)])
    [r] = run_suite({"t": df}, [Check("eq", "pair_equal", "t", columns=("a", "b"))])
    assert r.violations == 1 and r.total == 3  # NULL rows skipped


def test_multicolumn_sum_equal_check(spark):
    df = spark.createDataFrame([Row(a=1, b=9), Row(a=5, b=5), Row(a=4, b=7)])
    [r] = run_suite(
        {"t": df},
        [
            Check(
                "sums to 10",
                "multicolumn_sum_equal",
                "t",
                columns=("a", "b"),
                params={"sum_total": 10},
            )
        ],
    )
    assert r.violations == 1


def test_distinct_equal_set_check(spark):
    df = spark.createDataFrame([Row(s=x) for x in ("a", "b", "b", "z")])
    [r] = run_suite(
        {"t": df},
        [
            Check(
                "exact domain",
                "distinct_equal_set",
                "t",
                column="s",
                params={"values": ("a", "b", "c")},
            )
        ],
    )
    # 'c' missing + 'z' extra = 2 violations
    assert r.status == "fail" and r.violations == 2


def test_distinct_contain_set_pass(spark):
    df = spark.createDataFrame([Row(s=x) for x in ("a", "b", "c", "z")])
    [r] = run_suite(
        {"t": df},
        [
            Check(
                "coverage",
                "distinct_contain_set",
                "t",
                column="s",
                params={"values": ("a", "b", "c")},
            )
        ],
    )
    assert r.status == "pass" and r.violations == 0  # extras allowed


def test_z_score_check(spark):
    vals = [10.0] * 50 + [11.0] * 49 + [1000.0]
    df = spark.createDataFrame([Row(v=v) for v in vals])
    [r] = run_suite(
        {"t": df},
        [
            Check(
                "no outliers",
                "z_score_less_than",
                "t",
                column="v",
                params={"threshold": 3.0},
            )
        ],
    )
    assert r.status == "fail" and r.violations == 1 and r.total == 100


def test_monotonic_decreasing_check(spark):
    df = spark.createDataFrame(
        [Row(k=1, seq=i, v=x) for i, x in enumerate([9, 7, 7, 8, 3])]
    )
    [r] = run_suite(
        {"t": df},
        [
            Check(
                "desc",
                "monotonic",
                "t",
                column="v",
                params={"order_by": "seq", "partition_by": "k", "decreasing": True},
            )
        ],
    )
    assert r.violations == 1  # 7 -> 8 breaks non-strict decreasing


def test_monotonic_strictly_increasing(spark):
    df = spark.createDataFrame(
        [Row(k=1, seq=i, v=x) for i, x in enumerate([1, 2, 2, 5])]
    )
    [r] = run_suite(
        {"t": df},
        [
            Check(
                "strict asc",
                "monotonic",
                "t",
                column="v",
                params={"order_by": "seq", "partition_by": "k", "strictly": True},
            )
        ],
    )
    assert r.violations == 1  # the 2 -> 2 tie


def test_rowcount_equal_other_table_strict(spark):
    a = spark.range(10)
    b = spark.range(10)
    c = spark.range(7)
    [ok] = run_suite(
        {"a": a, "b": b},
        [Check("same", "row_count_equal_other_table", "a", params={"other_table": "b"})],
    )
    assert ok.status == "pass"
    [bad] = run_suite(
        {"a": a, "c": c},
        [Check("same", "row_count_equal_other_table", "a", params={"other_table": "c"})],
    )
    assert bad.status == "fail"


def test_monotonic_ge_roundtrip(tmp_path):
    check = Check(
        "desc ts",
        "monotonic",
        "t",
        column="v",
        params={"order_by": "seq", "decreasing": True},
    )
    d = check_to_dict(check)
    assert d["expectation_type"] == "expect_column_values_to_be_decreasing"
    back = check_from_dict(d)
    assert back.check_type == "monotonic" and back.params.get("decreasing") is True


# ---------------------------------------------------------------------------
# GE conditional expectations (row_condition scoping)
# ---------------------------------------------------------------------------


def test_row_condition_scopes_check(spark):
    rows = [
        Row(seg="gold", bal=100.0),
        Row(seg="gold", bal=-5.0),   # violates, in scope
        Row(seg="lead", bal=-50.0),  # violates but OUT of scope
        Row(seg="gold", bal=7.0),
    ]
    df = spark.createDataFrame(rows)
    [r] = run_suite(
        {"t": df},
        [
            Check(
                "gold balances non-negative",
                "values_between",
                "t",
                column="bal",
                params={"min": 0, "row_condition": "seg = 'gold'"},
            )
        ],
    )
    # scoped: 3 gold rows total, 1 violation; the lead row is ignored
    assert r.total == 3 and r.violations == 1 and r.status == "fail"


def test_row_condition_scopes_sample_and_quarantine(tmp_path, spark):
    rows = [
        Row(seg="gold", region="Mars"),
        Row(seg="lead", region="Pluto"),
        Row(seg="gold", region="Europe"),
    ]
    df = spark.createDataFrame(rows)
    check = Check(
        "gold regions",
        "values_in_set",
        "t",
        column="region",
        params={"values": ("Europe",), "row_condition": "seg = 'gold'"},
    )
    [r] = run_suite({"t": df}, [check])
    assert r.violations == 1
    assert "Mars" in r.observed["sample"] and "Pluto" not in r.observed["sample"]
    path = str(tmp_path / "q")
    write_violations(df, check, path)
    back = spark.read.parquet(path).collect()
    assert [b["region"] for b in back] == ["Mars"]  # scoped quarantine


def test_row_condition_ge_roundtrip():
    d = {
        "expectation_type": "expect_column_values_to_be_between",
        "kwargs": {
            "column": "bal",
            "min_value": 0,
            "row_condition": "seg = 'gold'",
            "condition_parser": "spark",
        },
        "meta": {"name": "scoped", "table": "t"},
    }
    check = check_from_dict(d)
    assert check.params["row_condition"] == "seg = 'gold'"
    assert "condition_parser" not in check.params


def test_column_count_between(spark):
    df = spark.createDataFrame([Row(a=1, b=2, c=3)])
    [ok] = run_suite(
        {"t": df},
        [Check("cols", "column_count_between", "t", params={"min": 2, "max": 5})],
    )
    assert ok.status == "pass"
    [bad] = run_suite(
        {"t": df}, [Check("cols", "column_count_between", "t", params={"max": 2})]
    )
    assert bad.status == "fail"


def test_chi_square_uniform_pass(spark):
    rows = [Row(t=x) for x in ("a", "b", "c", "d") * 25]
    df = spark.createDataFrame(rows)
    [r] = run_suite(
        {"t": df},
        [
            Check(
                "chi2",
                "chi_square_test",
                "t",
                column="t",
                params={
                    "expected_distribution": {k: 0.25 for k in "abcd"},
                    "critical_value": 7.815,  # chi2(0.95, dof=3)
                },
            )
        ],
    )
    assert r.status == "pass"
    assert float(r.observed["chi_square"]) == pytest.approx(0.0, abs=1e-9)


def test_chi_square_skew_fails(spark):
    rows = [Row(t="a")] * 90 + [Row(t="b")] * 10
    df = spark.createDataFrame(rows)
    [r] = run_suite(
        {"t": df},
        [
            Check(
                "chi2",
                "chi_square_test",
                "t",
                column="t",
                params={
                    "expected_distribution": {"a": 0.5, "b": 0.5},
                    "critical_value": 3.841,  # chi2(0.95, dof=1)
                },
            )
        ],
    )
    # statistic = (90-50)^2/50 + (10-50)^2/50 = 64 >> 3.841
    assert r.status == "fail"
    assert float(r.observed["chi_square"]) == pytest.approx(64.0, abs=1e-6)


def test_chi_square_absent_category_counts(spark):
    rows = [Row(t="a")] * 100  # 'b' expected but absent
    df = spark.createDataFrame(rows)
    [r] = run_suite(
        {"t": df},
        [
            Check(
                "chi2",
                "chi_square_test",
                "t",
                column="t",
                params={
                    "expected_distribution": {"a": 0.5, "b": 0.5},
                    "critical_value": 3.841,
                },
            )
        ],
    )
    # (100-50)^2/50 + (0-50)^2/50 = 50 + 50 = 100
    assert r.status == "fail"
    assert float(r.observed["chi_square"]) == pytest.approx(100.0, abs=1e-6)


def test_sessionization_gap_boundary_semantics(spark):
    """The batch sessionization uses native session_window; Spark's batch
    session merge is inclusive (event exactly at session_end extends it),
    which must match the oracle's `gap > 30 minutes` new-session rule:
    a 30:00.000000 gap stays one session, 30:00.000001 starts a new one."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("exact30", base, 1),
        ("exact30", base + dt.timedelta(minutes=30), 2),
        ("over30", base, 3),
        ("over30", base + dt.timedelta(minutes=30, microseconds=1), 4),
        ("under30", base, 5),
        ("under30", base + dt.timedelta(minutes=29), 6),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id long")
    sessions = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("session_count"))
    )
    got = {r["user_id"]: r["session_count"] for r in sessions.collect()}
    assert got == {"exact30": 1, "over30": 2, "under30": 1}


def test_categorical_check_matches_inline(spark):
    """categorical=True routes a row-condition check through a distinct-
    value groupBy factor; result must be identical to the inline path,
    including nulls, mostly, and row_condition scoping."""
    rows = (
        [Row(v="1-URGENT", seg="gold")] * 5
        + [Row(v="9-BOGUS", seg="gold")] * 3
        + [Row(v=None, seg="gold")] * 2
        + [Row(v="9-BOGUS", seg="bronze")] * 7
    )
    df = spark.createDataFrame(rows)
    for extra in (
        {},
        {"mostly": 0.5},
        {"row_condition": "seg = 'gold'"},
    ):
        base = Check(
            "rx", "match_regex", "t", column="v",
            params={"regex": r"^\d-[A-Z]+$", **extra},
        )
        cat = Check(
            "rx", "match_regex", "t", column="v",
            params={"regex": r"^\d-[A-Z]+$", "categorical": True, **extra},
        )
        [a] = run_suite({"t": df}, [base])
        [b] = run_suite({"t": df}, [cat])
        assert (a.status, a.violations, a.total) == (
            b.status,
            b.violations,
            b.total,
        ), extra


def test_categorical_pair_check(spark):
    df = spark.createDataFrame(
        [Row(a=2, b=1)] * 4 + [Row(a=1, b=2)] * 3 + [Row(a=None, b=1)] * 2
    )
    base = Check("pair", "pair_greater_than", "t", columns=("a", "b"))
    cat = Check(
        "pair", "pair_greater_than", "t", columns=("a", "b"),
        params={"categorical": True},
    )
    [x] = run_suite({"t": df}, [base])
    [y] = run_suite({"t": df}, [cat])
    assert (x.status, x.violations, x.total) == (y.status, y.violations, y.total)
