"""Dump `.explain("formatted")` physical plans for named queries to files.

Round-11 optimization deliverable: `plans/r11/<query>_{before,after}.txt`
so plan claims (Exchange counts, join strategy, PushedFilters, Python
eval nodes) are checkable without running Spark.

Usage: python tools/dump_plans.py <sf_dir> <out_dir> <suffix> <query> [...]
  e.g. python tools/dump_plans.py /root/testdata/sf0.1 plans/r11 before \
         events_user_gini dedup_semantic_docs
Writes <out_dir>/<query>_<suffix>.txt per query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir, out_dir, suffix, names = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        sys.argv[4:],
    )
    from enterprise_data_quality_platform_spark.queries import query_fns
    from enterprise_data_quality_platform_spark.session import get_spark

    spark = get_spark("edqp-dump-plans")
    fns = query_fns()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = fns[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
