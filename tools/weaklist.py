"""Mechanically recompute the letter-weak list from PERF_MULTISCALE.json.

The weak letter (VERDICT convention since r7): at the compute-dominated
tier, every non-demo entry with Spark/DuckDB ratio > 2.0 and DuckDB >=
0.5 s. Since r10 the committed 'spark' values for these entries are
fresh-JVM isolated medians (tools/multiscale.py weak rule), so this list
is computed from isolated numbers, not the sweep lottery.

Usage: python tools/weaklist.py [PERF_MULTISCALE.json] [tier]
Prints one line per weak entry (ratio, spark, duckdb, isolation trigger,
sweep value if isolated) plus the aggregate, and exits 0. Pure JSON —
safe to run during a measurement window.
"""

from __future__ import annotations

import json
import sys

WEAK_RATIO = 2.0
WEAK_DUCK_MIN_SEC = 0.5


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/PERF_MULTISCALE.json"
    tier = sys.argv[2] if len(sys.argv) > 2 else "10"
    doc = json.load(open(path))
    t = doc["tiers"][tier]
    demo = set(doc.get("demo_queries", []))
    iso = t.get("isolated", {})
    sweep = t.get("spark_sweep", {})

    weak = []
    for n, s in t["spark"].items():
        d = t["duckdb"][n]
        if n in demo or d < WEAK_DUCK_MIN_SEC:
            continue
        if s / d > WEAK_RATIO:
            weak.append((round(s / d, 2), n, s, d))
    weak.sort(reverse=True)

    print(f"# letter-weak at sf{tier} (> {WEAK_RATIO}x, DuckDB >= "
          f"{WEAK_DUCK_MIN_SEC}s, non-demo) from {path}")
    for r, n, s, d in weak:
        extra = ""
        if n in iso:
            extra = (f"  [isolated: trigger={iso[n].get('trigger', '?')}"
                     f", sweep={sweep.get(n, '?')}]")
        print(f"{r:6.2f}x  {n:40s} spark {s:8.3f}  duck {d:7.3f}{extra}")
    ws = sum(s for _, _, s, _ in weak)
    wd = sum(d for _, _, _, d in weak)
    print(f"count: {len(weak)}   weak aggregate: {ws:.1f}/{wd:.1f} = "
          f"{ws / wd:.2f}x" if weak else "count: 0")
    print(f"tier aggregate: {t['spark_total']}/{t['duckdb_total']} = "
          f"{t['aggregate_ratio']}x over {t['comparable_count']} comparable")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
