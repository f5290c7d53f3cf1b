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


def test_asof_split_hot_keys_matches_plain(spark):
    """One user owns 50% of both sides; the sliced window must return
    byte-identical results to the plain per-key window."""
    # hot key 0: 500 left rows spread over ~14 days; keys 1-9: 500 more
    left = spark.range(1000).select(
        F.when(F.col("id") < 500, 0).otherwise((F.col("id") % 9) + 1).alias("key"),
        F.timestamp_seconds(F.col("id") * 2400 + 1_700_000_000).alias("ts"),
        F.col("id"),
    )
    right = spark.range(300).select(
        F.when(F.col("id") < 150, 0).otherwise((F.col("id") % 9) + 1).alias("key"),
        F.timestamp_seconds(F.col("id") * 7919 + 1_700_000_000).alias("ts"),
        (F.col("id") * 10).alias("v"),
    )
    plain = asof_join(left, right, on="ts", key="key", right_value_cols=["v"])
    split = asof_join(
        left,
        right,
        on="ts",
        key="key",
        right_value_cols=["v"],
        split_hot_keys=True,
        slice_seconds=86400,
    )
    p = {(r.id): (r.ts_right, r.v_right) for r in plain.collect()}
    s = {(r.id): (r.ts_right, r.v_right) for r in split.collect()}
    assert p == s
    assert len(s) == 1000


def test_asof_split_bounds_window_groups(spark):
    """The point of the split: no (key, slice) window group holds more than
    one slice's worth of the hot key — max group size stays near the mean,
    instead of one group owning 50% of all rows."""
    n = 2000
    left = spark.range(n).select(
        F.lit(0).alias("key"),  # EVERY row on one key — worst case
        F.timestamp_seconds(F.col("id") * 3600 + 1_700_000_000).alias("ts"),
        F.col("id"),
    )
    right = left.select("key", "ts", (F.col("id") * 2).alias("v")).drop("id")
    out = asof_join(
        left, right, on="ts", key="key", right_value_cols=["v"],
        split_hot_keys=True, slice_seconds=86400,
    )
    assert out.count() == n
    # group cardinality check: with 1-day slices and hourly rows, each
    # (key, slice) group sees <= 24 left + 24 right + 1 carry rows, while
    # the unsplit window would put all 4000 in one group
    slices = (
        left.select(F.floor(F.unix_timestamp("ts") / 86400).alias("s"))
        .groupBy("s").count()
    )
    max_group = slices.agg(F.max("count")).collect()[0][0]
    assert max_group <= 24
