"""Materialization layer (SURVEY.md §1.4 raw/stg/mart layers).

The reference materializes stg/mart tables through dbt→BigQuery
(``pager-workflow.py:159,174,189``); here a model materializes as
partitioned Parquet. Partitioning policy is the 100TB lever: date-partition
fact/report tables so downstream reads partition-prune (SURVEY.md §4.2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def materialize_model(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    date_col: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Write a model, optionally date-partitioned (adds ``p_date`` derived
    from ``date_col``), and return the re-read frame so downstream stages
    consume the materialized (pruned, stats-bearing) copy — the natural
    stage boundary the dbt layer provided."""
    cols = None
    if date_col is not None:
        df = df.withColumn("p_date", F.to_date(F.col(date_col)))
        cols = ["p_date"]
    write_partitioned(df, path, cols, mode)
    return spark.read.parquet(path)
