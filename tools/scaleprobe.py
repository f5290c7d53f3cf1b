"""Oversized-tier memory-pressure probe (VERDICT r7 item 3).

The 100 TB posture claims rest on plan inspection; this converts them to
measurement: run the heaviest headline queries on a tier ~3x the usual
deep-bench one (sf30, gitignored, built by tools/make_sf1.py from sf10)
under a DELIBERATELY small heap, and record per query from Spark's
AppStatusStore: wall time, memory/disk spill bytes, shuffle read/write
bytes, peak execution memory, failed tasks — the evidence that the plans
degrade gracefully (spill, not OOM) when the data outgrows memory, which
is what a 1000-executor run needs from every operator.

Also runs a labeled SYNTHETIC skew-join demo (the corpus has no natural
heavy key: events.user_id max is 1.5x avg) with AQE skew thresholds
lowered to this scale, asserting the skew=true split actually engages.

Usage:
  EDQP_DRIVER_MEMORY=6g python tools/scaleprobe.py [sf_dir] [out.json] [q ...]
Defaults: /root/repo/testdata_sf30, PERF_SCALEPROBE.json, the 5 heaviest.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

DEFAULT_QUERIES = [
    "mart_part_affinity",
    "mart_local_supplier_volume",
    "mart_shipping_priority",
    "dq_key_skew",
    "events_scd2_checksum",
]


def stage_totals(sc) -> dict[str, int]:
    """Sum task metrics over all stages seen so far (AppStatusStore)."""
    store = sc._jsc.sc().statusStore()
    stages = getattr(store, "stageList")(
        sc._jvm.java.util.ArrayList(),
        *(getattr(store, f"stageList$default${i}")() for i in range(2, 6)),
    )
    tot = {
        "memory_spill_bytes": 0,
        "disk_spill_bytes": 0,
        "shuffle_write_bytes": 0,
        "shuffle_read_bytes": 0,
        "peak_execution_memory": 0,
        "failed_tasks": 0,
        "stages": stages.size(),
    }
    for i in range(stages.size()):
        s = stages.apply(i)
        tot["memory_spill_bytes"] += s.memoryBytesSpilled()
        tot["disk_spill_bytes"] += s.diskBytesSpilled()
        tot["shuffle_write_bytes"] += s.shuffleWriteBytes()
        tot["shuffle_read_bytes"] += s.shuffleReadBytes()
        tot["peak_execution_memory"] = max(
            tot["peak_execution_memory"], s.peakExecutionMemory()
        )
        tot["failed_tasks"] += s.numFailedTasks()
    return tot


def skew_join_demo(spark, sf_dir: str) -> dict:
    """Labeled synthetic AQE-skew demonstration: 40% of lineitem rows land
    on ONE join key; the dim side is too large to broadcast; thresholds
    lowered so the local tier crosses them the way a 100 TB hot key
    crosses the defaults. Asserts the executed plan carries the
    skew=true SMJ marker (AQE split the hot partition)."""
    from pyspark.sql import functions as F

    from enterprise_data_quality_platform_spark.catalog import table

    # read the table BEFORE touching confs: catalog.table() re-applies
    # RUNTIME_CONFS (configure_session), which would silently restore the
    # adaptive broadcast ceiling and turn this SMJ into a BHJ — the skew
    # path under test would never plan (found live: the first probe run
    # reported skew_split_engaged=False for exactly this reason)
    li = table(spark, sf_dir, "lineitem")
    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    # factor 2.0, not the default 5.0: skew detection compares COMPRESSED
    # shuffle bytes, and the hot partition's constant join key compresses
    # far better than the mixed-key partitions — a 21x ROW skew lands
    # around 3-4x in bytes here (found live: the first probe run detected
    # "0 skewed partitions" at the default factor on this very data)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        skew_key = F.when(
            F.pmod(F.col("l_orderkey"), F.lit(10)) < 4, F.lit(0)
        ).otherwise(F.pmod(F.col("l_orderkey"), F.lit(200000))).alias("k")
        fact = li.select(skew_key, "l_extendedprice")
        dim = (
            spark.range(200000)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        )
        t0 = time.perf_counter()
        df = (
            fact.join(dim, "k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
        )
        row = df.collect()[0]
        wall = round(time.perf_counter() - t0, 2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        return {
            "wall_sec": wall,
            "rows_joined": row.n,
            "skew_split_engaged": "skew=true" in plan,
        }
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf30"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/PERF_SCALEPROBE.json"
    names = sys.argv[3:] or DEFAULT_QUERIES

    from enterprise_data_quality_platform_spark.queries import query_fns
    from enterprise_data_quality_platform_spark.session import get_spark

    heap = os.environ.get("EDQP_DRIVER_MEMORY", "16g")
    spark = get_spark("edqp-scaleprobe")
    sc = spark.sparkContext
    fns = query_fns()

    doc: dict = {
        "metric": "oversized_tier_memory_pressure_probe",
        "sf_dir": sf_dir,
        "heap": heap,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "launch_loadavg": [round(x, 2) for x in os.getloadavg()],
        "queries": {},
    }
    for name in names:
        before = stage_totals(sc)
        la = round(os.getloadavg()[0], 2)
        t0 = time.perf_counter()
        try:
            rows = len(fns[name](spark, sf_dir).collect())
            status = "ok"
        except Exception as exc:  # record the failure mode, keep probing
            rows, status = -1, f"FAILED: {type(exc).__name__}: {exc}"[:300]
        wall = round(time.perf_counter() - t0, 2)
        after = stage_totals(sc)
        delta = {
            k: after[k] - before[k]
            for k in (
                "memory_spill_bytes",
                "disk_spill_bytes",
                "shuffle_write_bytes",
                "shuffle_read_bytes",
                "failed_tasks",
                "stages",
            )
        }
        delta["peak_execution_memory"] = after["peak_execution_memory"]
        doc["queries"][name] = {
            "status": status,
            "wall_sec": wall,
            "rows": rows,
            "loadavg1_before": la,
            **delta,
        }
        print(f"{name}: {status} {wall}s rows={rows} "
              f"spill={delta['disk_spill_bytes']>>20}MiB-disk/"
              f"{delta['memory_spill_bytes']>>20}MiB-mem "
              f"shufW={delta['shuffle_write_bytes']>>20}MiB "
              f"failed_tasks={delta['failed_tasks']}",
              file=sys.stderr, flush=True)

    doc["synthetic_skew_join"] = skew_join_demo(spark, sf_dir)
    print("skew demo:", doc["synthetic_skew_join"], file=sys.stderr, flush=True)

    Path(out_path).write_text(json.dumps(doc, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
