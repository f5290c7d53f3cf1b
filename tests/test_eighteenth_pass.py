"""Tests for the eighteenth-pass operators: Q14 promo share, Q19
disjunctive-predicate join, count-min frequency sketch."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from conftest import SF_SMALL

from enterprise_data_quality_platform_spark.queries import all_queries

SPECS = all_queries()


def plan_of(spark, name: str) -> str:
    df = SPECS[name].fn(spark, SF_SMALL)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_promo_share_conditional_aggregate(spark, monkeypatch):
    import enterprise_data_quality_platform_spark.queries.relational as rel

    d = datetime.datetime(2024, 5, 10)
    li = spark.createDataFrame(
        [
            (1, 100.0, 0.0, d),  # promo: 100
            (2, 300.0, 0.0, d),  # standard: 300
        ],
        "l_partkey long, l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "STANDARD")], "p_partkey long, p_type string"
    )
    tables = {"lineitem": li, "part": part}
    monkeypatch.setattr(rel, "table", lambda s, dd, n: tables[n])
    rows = rel.mart_promo_revenue_share(spark, "x").collect()
    assert len(rows) == 1
    assert rows[0].promo_share_pct == 25.0 and rows[0].n_lines == 2


def test_promo_share_single_aggregate_no_second_scan(spark):
    import re

    plan = plan_of(spark, "mart_promo_revenue_share")
    # r8 bitmap flag-join: ONE lineitem scan (the load-bearing invariant —
    # both sums still come from one conditional aggregate over one probe
    # pass) + TWO part scans (the word-bitmap build and the duplicate-key
    # guard's recount; Catalyst duplicates the dim subtree for the 1-row
    # guard aggregate — adjudicated: 2M dim rows off the fact path, the
    # same deliberate trade as the affinity pack guard).
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 3
    assert plan.count("lineitem.parquet") == 1


def test_disjunctive_join_stays_hash_join(spark):
    """The OR spans both sides, but the common partkey equi-condition must
    still drive a hash join — never a nested loop."""
    plan = plan_of(spark, "mart_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_disjunctive_bands_are_exclusive_filters(spark, monkeypatch):
    import enterprise_data_quality_platform_spark.queries.relational as rel

    li = spark.createDataFrame(
        [
            (1, 5.0, 100.0, 0.0),   # Brand#12, qty 5 in [1,11] -> kept
            (1, 12.0, 100.0, 0.0),  # Brand#12, qty 12 out of band
            (2, 15.0, 50.0, 0.0),   # Brand#23, qty 15 in [10,20] -> kept
            (3, 15.0, 70.0, 0.0),   # Brand#34, qty 15 out of [20,30]
        ],
        "l_partkey long, l_quantity double, l_extendedprice double, l_discount double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#12", 10), (2, "Brand#23", 20), (3, "Brand#34", 30)],
        "p_partkey long, p_brand string, p_size int",
    )
    tables = {"lineitem": li, "part": part}
    monkeypatch.setattr(rel, "table", lambda s, d, n: tables[n])
    row = rel.mart_disjunctive_revenue(spark, "x").collect()[0]
    assert (row.n_lines, row.revenue) == (2, 150.0)


def test_freq_sketch_never_underestimates(spark):
    rows = SPECS["dq_freq_sketch"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 5
    total = sum(r.exact_count for r in rows)  # lower bound on N
    for r in rows:
        assert r.cms_estimate >= r.exact_count  # CMS invariant
        # eps=0.001 of N(>=1000 at sf0.001) -> tiny overestimate budget
        assert r.cms_estimate - r.exact_count <= max(10, total)
