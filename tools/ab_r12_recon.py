"""A/B: dq_reconciliation current (pre-agg + left join + 1-row agg) vs
union-aggregate (one shuffle, no join) — VERDICT r11 item 4.

Usage: python tools/ab_r12_recon.py <sf_dir> [runs]
Alternating in-session warm runs, medians, plus a result byte-compare.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from enterprise_data_quality_platform_spark.catalog import table  # noqa: E402
from enterprise_data_quality_platform_spark.queries.dq import (  # noqa: E402
    dq_reconciliation,
)
from enterprise_data_quality_platform_spark.session import get_spark  # noqa: E402


def union_agg(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")  # noqa: E731
    s1 = orders.select(
        F.col("o_orderkey").alias("key"),
        cents("o_totalprice").alias("hdr"),
        F.lit(None).cast("long").alias("lc"),
        F.lit(1).cast("tinyint").alias("oh"),
    )
    s2 = lineitem.select(
        F.col("l_orderkey").alias("key"),
        F.lit(None).cast("long").alias("hdr"),
        cents("l_extendedprice").alias("lc"),
        F.lit(None).cast("tinyint").alias("oh"),
    )
    per_key = (
        s1.unionAll(s2)
        .groupBy("key")
        .agg(
            F.max("hdr").alias("header_cents"),
            F.sum("lc").alias("line_cents"),
            F.count("oh").alias("n_hdr"),
        )
    )
    has_hdr = F.col("n_hdr") > 0
    mismatch = (
        has_hdr
        & F.col("line_cents").isNotNull()
        & (F.col("line_cents") != F.col("header_cents"))
    )
    return per_key.agg(
        F.sum("n_hdr").alias("n_orders"),
        F.count(F.when(has_hdr & F.col("line_cents").isNotNull(), 1)).alias(
            "n_with_lines"
        ),
        F.sum(F.when(has_hdr & F.col("line_cents").isNull(), F.col("n_hdr")).otherwise(F.lit(0))).alias(
            "n_childless"
        ),
        F.count(F.when(mismatch, 1)).alias("n_mismatched"),
        (
            F.count(F.when(mismatch, 1))
            / F.count(F.when(has_hdr & F.col("line_cents").isNotNull(), 1))
        ).alias("mismatch_rate"),
    )


def shj(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")  # noqa: E731
    line_sums = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(cents("l_extendedprice")).alias("line_cents"))
        .hint("shuffle_hash")
    )
    joined = orders.select(
        "o_orderkey", cents("o_totalprice").alias("header_cents")
    ).join(line_sums, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    mismatch = F.col("line_cents").isNotNull() & (
        F.col("line_cents") != F.col("header_cents")
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("line_cents").alias("n_with_lines"),
        F.count(F.when(F.col("line_cents").isNull(), 1)).alias("n_childless"),
        F.count(F.when(mismatch, 1)).alias("n_mismatched"),
        (F.count(F.when(mismatch, 1)) / F.count("line_cents")).alias(
            "mismatch_rate"
        ),
    )


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-recon")
    arms = {"old": dq_reconciliation, "new": union_agg, "shj": shj}
    rows = {k: f(spark, sf_dir).collect() for k, f in arms.items()}
    print("rows old:", rows["old"])
    print("rows new:", rows["new"])
    for k in arms:
        assert [tuple(r) for r in rows[k]] == [tuple(r) for r in rows["old"]], f"MISMATCH {k}"
    samples: dict[str, list[float]] = {k: [] for k in arms}
    for k, f in arms.items():  # warm both
        f(spark, sf_dir).collect()
    for _ in range(runs):
        for k, f in arms.items():
            t0 = time.perf_counter()
            f(spark, sf_dir).collect()
            samples[k].append(time.perf_counter() - t0)
    for k in arms:
        print(k, round(statistics.median(samples[k]), 4), [round(s, 3) for s in samples[k]])


if __name__ == "__main__":
    main()
