"""Decomposition + A/B for mart_part_affinity — VERDICT r11 item 2.

Stages (noop sink, guide §1.4):
  pairs(noop)  — scan + exchange + SHJ self-join + packed-pair project
  agg(noop)    — + groupBy(pk).count (the 120M-key aggregate)
  full         — the registered query

Variants:
  parts<N>     — spark.sql.shuffle.partitions=N for the whole query
                 (planning-time conf; AQE coalesce still applies)

Usage: python tools/ab_r12_affinity.py <sf_dir> [runs]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from enterprise_data_quality_platform_spark.catalog import table  # noqa: E402
from enterprise_data_quality_platform_spark.queries.relational import (  # noqa: E402
    mart_part_affinity,
)
from enterprise_data_quality_platform_spark.session import get_spark  # noqa: E402


def _pairs(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b").hint("shuffle_hash")
    packed = F.shiftleft(F.col("a.l_partkey"), 32).bitwiseOR(F.col("b.l_partkey"))
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(packed.alias("pk"))


def stage_pairs(spark, sf_dir):
    return _pairs(spark, sf_dir)


def stage_agg(spark, sf_dir):
    return (
        _pairs(spark, sf_dir)
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("together_count"))
    )


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-affinity")

    def run_noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn, label, samples, collect):
        t0 = time.perf_counter()
        if collect:
            fn().collect()
        else:
            run_noop(fn())
        samples.setdefault(label, []).append(time.perf_counter() - t0)

    samples: dict[str, list[float]] = {}
    arms = [
        ("pairs(noop)", lambda: stage_pairs(spark, sf_dir), False, None),
        ("agg(noop)", lambda: stage_agg(spark, sf_dir), False, None),
        ("full32", lambda: mart_part_affinity(spark, sf_dir), True, "32"),
        ("full96", lambda: mart_part_affinity(spark, sf_dir), True, "96"),
    ]
    for label, fn, collect, parts in arms:  # warm
        if parts:
            spark.conf.set("spark.sql.shuffle.partitions", parts)
        timed(fn, "_warm_" + label, {}, collect)
    for _ in range(runs):
        for label, fn, collect, parts in arms:
            if parts:
                spark.conf.set("spark.sql.shuffle.partitions", parts)
            timed(fn, label, samples, collect)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    for label, vals in samples.items():
        print(label, round(statistics.median(vals), 4), [round(s, 3) for s in vals])


if __name__ == "__main__":
    main()
