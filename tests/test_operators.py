"""As-of join and range join operator tests (custom operators Spark lacks;
semantics anchored by hand fixtures + equivalence with the naive plan)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from enterprise_data_quality_platform_spark.operators import asof_join, interval_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(key=1, ts=_ts("2024-01-01 10:00:00"), name="a"),
            Row(key=1, ts=_ts("2024-01-01 12:00:00"), name="b"),
            Row(key=2, ts=_ts("2024-01-01 09:00:00"), name="c"),  # no match
            Row(key=1, ts=_ts("2024-01-01 11:00:00"), name="d"),  # equal-ts match
        ]
    )
    right = spark.createDataFrame(
        [
            Row(key=1, ts=_ts("2024-01-01 09:30:00"), v=1.0),
            Row(key=1, ts=_ts("2024-01-01 11:00:00"), v=2.0),
            Row(key=2, ts=_ts("2024-01-01 09:30:00"), v=3.0),
        ]
    )
    out = {
        r.name: (r.ts_right, r.v_right)
        for r in asof_join(left, right, on="ts", key="key", right_value_cols=["v"]).collect()
    }
    assert out["a"] == (_ts("2024-01-01 09:30:00"), 1.0)  # backward
    assert out["b"] == (_ts("2024-01-01 11:00:00"), 2.0)  # latest prior
    assert out["c"] == (None, None)  # right is later → no match
    assert out["d"] == (_ts("2024-01-01 11:00:00"), 2.0)  # <= includes equal


def test_asof_preserves_left_rows(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("key"),
        F.timestamp_seconds(F.col("id") * 60 + 1_700_000_000).alias("ts"),
        F.col("id"),
    )
    right = spark.range(10).select(
        (F.col("id") % 5).alias("key"),
        F.timestamp_seconds(F.col("id") * 500 + 1_700_000_000).alias("ts"),
    )
    out = asof_join(left, right, on="ts", key="key")
    assert out.count() == 100  # left join semantics: every left row kept


def test_interval_join_matches_naive(spark):
    points = spark.range(500).select(
        F.col("id").alias("pid"),
        F.timestamp_seconds(F.col("id") * 97 + 1_700_000_000).alias("ts"),
    )
    intervals = spark.range(40).select(
        F.col("id").alias("iid"),
        F.timestamp_seconds(F.col("id") * 1100 + 1_700_000_000).alias("start_ts"),
        F.timestamp_seconds(F.col("id") * 1100 + 1_700_000_900).alias("end_ts"),
    )
    fast = interval_join(points, intervals, "ts", "start_ts", "end_ts", 900)
    naive = points.join(
        intervals,
        (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")),
    )
    fast_pairs = {(r.pid, r.iid) for r in fast.collect()}
    naive_pairs = {(r.pid, r.iid) for r in naive.collect()}
    assert fast_pairs == naive_pairs
    assert len(fast_pairs) > 0


def test_interval_join_plans_hash_join_not_nested_loop(spark):
    points = spark.range(100).select(
        F.timestamp_seconds(F.col("id") * 60 + 1_700_000_000).alias("ts")
    )
    intervals = spark.range(10).select(
        F.timestamp_seconds(F.col("id") * 600 + 1_700_000_000).alias("start_ts"),
        F.timestamp_seconds(F.col("id") * 600 + 1_700_000_500).alias("end_ts"),
    )
    plan = interval_join(
        points, intervals, "ts", "start_ts", "end_ts", 600
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "NestedLoop" not in plan  # the whole point of the bucket trick
