"""A/B: events_user_transitions variants — VERDICT r11 item 8.

Variants:
  old   — current: alias from_type BEFORE the window (the exchange carries
          the event_type string TWICE: once as event_type for lead, once
          as the pre-aliased from_type copy).
  slim  — alias AFTER the window: one string copy through the exchange.
  dict  — dictionary-encode event_type to a byte code before the window
          (distinct-types job + CASE map both ways); the exchange carries
          (user_id, ts, event_id, tinyint).

Usage: python tools/ab_r12_transitions.py <sf_dir> [runs]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from enterprise_data_quality_platform_spark.catalog import table  # noqa: E402
from enterprise_data_quality_platform_spark.queries.events import (  # noqa: E402
    events_user_transitions,
)
from enterprise_data_quality_platform_spark.session import get_spark  # noqa: E402


def _finish(counts):
    norm = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "transition_count",
        (F.col("transition_count") / F.sum("transition_count").over(norm)).alias(
            "transition_prob"
        ),
    ).orderBy("from_type", "to_type")


def slim(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        events.select(
            "event_type", F.lead("event_type").over(w).alias("to_type")
        )
        .filter(F.col("to_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), "to_type")
    )
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("transition_count")
    )
    return _finish(counts)


def dict_coded(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    types = sorted(
        r[0]
        for r in events.select("event_type").distinct().collect()
        if r[0] is not None
    )
    enc = F.when(F.col("event_type") == types[0], F.lit(0))
    for i, t in enumerate(types[1:], 1):
        enc = enc.when(F.col("event_type") == t, F.lit(i))
    enc = enc.cast("tinyint")

    def dec(col):
        d = F.when(col == 0, F.lit(types[0]))
        for i, t in enumerate(types[1:], 1):
            d = d.when(col == i, F.lit(t))
        return d

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        events.select("user_id", "ts", "event_id", enc.alias("fc"))
        .select("fc", F.lead("fc").over(w).alias("tc"))
        .filter(F.col("tc").isNotNull())
    )
    counts = seq.groupBy("fc", "tc").agg(F.count(F.lit(1)).alias("transition_count"))
    return _finish(
        counts.select(
            dec(F.col("fc")).alias("from_type"),
            dec(F.col("tc")).alias("to_type"),
            "transition_count",
        )
    )


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-transitions")
    arms = {"old": events_user_transitions, "slim": slim, "dict": dict_coded}
    rows = {k: f(spark, sf_dir).collect() for k, f in arms.items()}
    base = [tuple(r) for r in rows["old"]]
    for k in arms:
        assert [tuple(r) for r in rows[k]] == base, f"MISMATCH {k}"
    print("results identical:", len(base), "rows")
    samples: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(runs):
        for k, f in arms.items():
            t0 = time.perf_counter()
            f(spark, sf_dir).collect()
            samples[k].append(time.perf_counter() - t0)
    for k in arms:
        print(k, round(statistics.median(samples[k]), 4), [round(s, 3) for s in samples[k]])


if __name__ == "__main__":
    main()
