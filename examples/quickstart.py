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

    # 4 — near-dup families: MinHash (Jaccard), winnowing (guaranteed
    # shared-run detection) — pair graphs + keep-one-per-cluster
    from enterprise_data_quality_platform_spark.dedup import keep_one_per_cluster
    from enterprise_data_quality_platform_spark.plans.training_data import (
        winnow_pairs,
    )

    pairs = winnow_pairs(tables["documents"], min_shared=2)
    print("winnow near-dup pairs:", pairs.count())
    print("docs after winnow dedup:",
          keep_one_per_cluster(tables["documents"], pairs).count(), "\n")

    # 5 — static data-docs page (the GE rendered-docs analogue)
    from enterprise_data_quality_platform_spark.checks.suite_io import (
        write_data_docs,
    )

    docs_path = write_data_docs(
        results, f"{tempfile.mkdtemp(prefix='edqp-docs-')}/index.html",
        suite_name="quickstart",
    )
    print("data docs:", docs_path, "\n")

    # 6 — incremental mart refresh: rebuild ONE day, re-validate
    from enterprise_data_quality_platform_spark.plans.reference_pipelines import (
        incremental_refresh_pipeline,
    )

    mart_path = tempfile.mkdtemp(prefix="edqp-mart-") + "/events_daily"
    incremental_refresh_pipeline(spark, sf_dir, mart_path).run()  # bootstrap
    print("refreshed partitions:",
          spark.read.parquet(mart_path).select("p_date").distinct().count(), "\n")

    # 7 — streaming: the same tumbling aggregate as a stream (AvailableNow)
    from enterprise_data_quality_platform_spark.streaming import (
        events_stream,
        streaming_tumbling_counts,
    )

    q = (
        streaming_tumbling_counts(events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName("qs_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="edqp-ckpt-"))
        .start()
    )
    q.awaitTermination()
    print("streaming tumbling windows:", spark.table("qs_tumbling").count(), "\n")

    # 8 — drop-in reference API (analysis.md's DataValidationPipeline)
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
