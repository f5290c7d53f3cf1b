"""Quickstart: the engine's main surfaces in one script.

Run:  python examples/quickstart.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from enterprise_data_quality_platform_spark import (
    Check,
    DataValidationPipeline,
    gate,
    get_spark,
    load_tables,
    run_suite,
    suite_report_df,
)
from enterprise_data_quality_platform_spark.checks.runner import ValidationGateError
from enterprise_data_quality_platform_spark.checks.suite_io import render_data_docs
from enterprise_data_quality_platform_spark.models import marts
from enterprise_data_quality_platform_spark.plans.training_data import (
    corpus_stats,
    curate_documents,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("quickstart")
    tables = load_tables(spark, sf_dir)

    # 1 — declarative DQ suite: compiled to ONE fused Spark job
    suite = [
        Check("orders non-empty", "row_count_between", "orders", params={"min": 1}),
        Check("custkey not null", "not_null", "orders", column="o_custkey"),
        Check("status domain", "values_in_set", "orders", column="o_orderstatus",
              params={"values": ("O", "F", "P")}),
        Check("orders→customer RI", "referential_integrity", "orders",
              column="o_custkey",
              params={"parent_table": "customer", "parent_column": "c_custkey"}),
        Check("whitelist (fails by design)", "values_in_set", "nation",
              column="n_name",
              params={"values": tuple(f"NATION_{i}" for i in range(20))}),
    ]
    results = run_suite(tables, suite)
    print(render_data_docs(results), "\n")
    suite_report_df(spark, results).show(truncate=False)
    try:
        gate(results)
    except ValidationGateError as exc:
        print(f"gate: {exc}\n")

    # 2 — mart transform (the dbt replacement)
    marts.mart_region_revenue(
        tables["orders"], tables["customer"], tables["nation"], tables["region"]
    ).show()

    # 3 — training-data curation funnel over the documents table
    curated = curate_documents(tables["documents"], with_near_dup=True)
    corpus_stats(curated).show()

    # 4 — drop-in reference API (analysis.md's DataValidationPipeline)
    pipeline = DataValidationPipeline(spark)
    summary = pipeline.run_all_validations(
        [
            {"region": "Europe", "timestamp": "2025-09-19T14:10:00Z", "value": 250},
            {"region": "South America", "timestamp": "2025-09-19T14:12:00Z", "value": 300},
        ]
    )
    print("compat pipeline:", summary["overall_status"], "-",
          [v["validation_name"] for v in summary["results"] if v["status"] == "failed"])


if __name__ == "__main__":
    main()
