"""Repeated-fact-scan audit: how many times does each query's EXECUTED
plan reference each base table's parquet path?

Multiple references to the same fact in one plan usually mean Catalyst
de-canonicalized a logically-shared subtree (per-consumer aggregate
pruning, one-sided inferred IsNotNull, broadcast-wrapped factors) and the
fact is genuinely scanned more than once — the class of regression that
is invisible in wall-clock at test SF but multiplies I/O at 100 TB.
Round-5 catches: events_gapfill_hourly (3 scans), events_dau_wau /
events_retention_cohorts / events_churn_inactivity (2 each),
dedup_incremental_shard (in-plan state re-derived ~11x).

Reading the output: the executed-plan string prints BOTH the final and
the initial adaptive plan, so a single real scan usually appears twice;
entries here report the FINAL-plan section count (true scans) plus the
ReusedExchange count. Deliberate two-pass shapes (dq_anomaly_zscore's
bounds pass, dq_snapshot_diff's two slices, probe-vs-corpus similarity,
derived-partsupp twins) legitimately show 2 — the audit flags, a human
adjudicates (adjudications in PERF.md round-5 third-session ledger).

Usage:
    python tools/scan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from enterprise_data_quality_platform_spark.session import get_spark

    spark = get_spark("scan-audit")
    flagged = 0
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            df.collect()  # materialize so AQE reaches the final plan
            plan = df._jdf.queryExecution().executedPlan().toString()
            final = plan.split("== Initial Plan ==")[0]
            counts = {
                t: n
                for t in TABLES
                if (n := len(re.findall(rf"{t}\.parquet", final))) > 1
            }
            reuse = final.count("ReusedExchange")
            if counts:
                flagged += 1
                print(f"FLAG {name} {counts} reuse={reuse}", flush=True)
            else:
                print(f"ok   {name}", flush=True)
        except Exception as e:  # noqa: BLE001 - audit keeps going
            print(f"ERR  {name}: {e.__class__.__name__}: {str(e)[:160]}", flush=True)
    print(f"\n{flagged} flagged (multi-scan in final plan)")
    spark.stop()


if __name__ == "__main__":
    main()
