"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``enterprise_data_quality_platform_spark``;
this module only adapts the registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the caller's CWD
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from enterprise_data_quality_platform_spark.queries import (  # noqa: E402
    oracle_sqls,
    query_fns,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: mart_region_revenue — scan → broadcast
    star join → hash agg → sort (SURVEY.md §5.3), the Spark-native analogue
    of the reference's sales-performance mart
    (/root/reference/airflow/dags/pager-workflow.py:189)."""
    fns = query_fns()
    return fns["mart_region_revenue"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; rows-only queries are omitted."""
    return oracle_sqls()
