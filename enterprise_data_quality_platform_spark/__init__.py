"""enterprise_data_quality_platform_spark — a PySpark-native data-quality +
analytics engine.

Re-expresses the semantics of the reference orchestration platform
(jessicajames1999/enterprise-data-quality-platform: Airflow DAGs shipping
validation SQL to BigQuery, dbt Cloud transforms, Glue ETL, PagerDuty/agent
alert fan-out) as an in-process Spark engine:

- ``checks``    — GE-style declarative data-quality checks compiled to Spark
                  expressions with single-scan fusion (SURVEY.md §2.2, §4.2).
- ``models``    — staging/mart transforms replacing the dbt layer (§2.3).
- ``queries``   — the declared query registry backing ``__spark_entry__.py``
                  (§2.7), each paired with a DuckDB oracle.
- ``functions`` — text/vector scalar helpers (JVM-side where possible).
- ``dedup``     — exact, MinHash-LSH, SimHash, n-gram Jaccard dedup (§2.6).
- ``similarity``— brute-force + LSH-bucketed cosine kNN (§2.6).
- ``streaming`` — Structured Streaming DQ gate replacing poll-and-revalidate
                  (§2.4).
- ``alerts``    — idempotent alert sink with incident_key lifecycle (§2.5 O4).
"""

__version__ = "0.1.0"

# Public API surface — a reference user switching engines starts here.
from .catalog import load_tables, table  # noqa: E402,F401
from .checks import (  # noqa: E402,F401
    Check,
    gate,
    run_suite,
    suite_report_df,
)
from .compat import DataValidationPipeline  # noqa: E402,F401
from .session import configure_session, get_spark  # noqa: E402,F401

__all__ = [
    "get_spark",
    "configure_session",
    "table",
    "load_tables",
    "Check",
    "run_suite",
    "gate",
    "suite_report_df",
    "DataValidationPipeline",
    "__version__",
]
