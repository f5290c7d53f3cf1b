"""Single-pass table profiler (SURVEY.md §4.3 "single-pass profiling per
table").

The profiling primitive underneath check tuning: for every requested column,
null count + type-appropriate stats, all folded into ONE ``df.agg`` — a
whole-table profile costs exactly one scan regardless of column count.
At 100 TB pass ``approx=True`` to use mergeable sketches
(approx_count_distinct) for the distinct counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.numeric import fx_avg

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_exprs(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> dict[str, Column]:
    """alias -> aggregate Column for a one-scan profile."""
    cols = columns or df.columns
    distinct = F.approx_count_distinct if approx else F.count_distinct
    exprs: dict[str, Column] = {"row_count": F.count(F.lit(1))}
    for name in cols:
        c = F.col(name)
        dtype = df.schema[name].dataType
        exprs[f"{name}__nulls"] = F.sum(
            F.when(c.isNull(), 1).otherwise(0)
        ).cast("long")
        exprs[f"{name}__distinct"] = distinct(c).cast("long")
        if isinstance(dtype, _NUMERIC):
            exprs[f"{name}__min"] = F.min(c.cast("double"))
            exprs[f"{name}__max"] = F.max(c.cast("double"))
            exprs[f"{name}__mean"] = fx_avg(c.cast("double"), f"{name}__mean")
        elif isinstance(dtype, T.StringType):
            exprs[f"{name}__min_len"] = F.min(F.length(c)).cast("long")
            exprs[f"{name}__max_len"] = F.max(F.length(c)).cast("long")
        elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            exprs[f"{name}__min_ts"] = F.min(c)
            exprs[f"{name}__max_ts"] = F.max(c)
    return exprs


def profile_table(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """One-row, one-scan profile frame."""
    exprs = profile_exprs(df, columns, approx)
    # fx_avg already aliases; alias the rest
    named = [
        col if alias.endswith("__mean") else col.alias(alias)
        for alias, col in exprs.items()
    ]
    return df.agg(*named)
