"""Grouped top-k as a first-class operator (SURVEY.md §2.3 R9/R10's
composite): keep the k best rows per group WITHOUT serializing any group
through one task.

Three strategies, picked by what the caller knows:

- ``topk_per_group``: the general two-level form (the knn
  ``_topk_per_probe`` pattern, generalized) — level 1 ranks within
  (group, physical-partition) and cuts to k per input partition, level 2
  merges the ≤ k×P survivors per group. The right default whenever group
  sizes can be large or skewed (a naive window partitioned by the group
  alone co-locates every row of a hot group in one task).
- ``topk_per_group_window``: the plain one-window form — correct and
  cheapest when groups are known-small (Spark 3.5+'s WindowGroupLimit
  pushes the rank filter below the sort, so survivors are pruned
  map-side).

Both emit the same schema (input columns + ``rank``), are deterministic
under a total tiebreak (the caller's order columns MUST break ties — pass
a unique id last), and are value-identical (pinned by test).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _require_order(order: list[Column] | tuple[Column, ...]) -> list[Column]:
    if not order:
        raise ValueError("topk needs at least one ORDER column (with a "
                         "unique tiebreak last for determinism)")
    return list(order)


def topk_per_group_window(
    df: DataFrame, group_cols: list[str], order: list[Column], k: int
) -> DataFrame:
    """One-window grouped top-k (WindowGroupLimit path)."""
    w = Window.partitionBy(*group_cols).orderBy(*_require_order(order))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_per_group(
    df: DataFrame, group_cols: list[str], order: list[Column], k: int
) -> DataFrame:
    """Two-level grouped top-k: partition-local prune to k, then a
    per-group merge over ≤ k×P survivors. Skew-immune: a hot group's rows
    stay spread across their input partitions through level 1."""
    order = _require_order(order)
    w_local = Window.partitionBy(*group_cols, "__pid").orderBy(*order)
    local = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .drop("__pid", "__lr")
    )
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
