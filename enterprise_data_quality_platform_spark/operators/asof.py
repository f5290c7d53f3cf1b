"""As-of join — an operator Spark's join menu lacks natively.

``asof_join(left, right, on, key)``: for every left row, attach the
greatest right timestamp <= the left timestamp within the same key (the
kdb/DuckDB/Pandas ``ASOF JOIN`` backward semantics).

Implementation is the union-and-carry-forward composition, NOT a join:

1. tag right rows 0 and left rows 1, union by (key, ts, tag);
2. one window per key ordered by (ts, tag): ``last(right_ts, ignorenulls)``
   over rows UNBOUNDED PRECEDING..CURRENT carries the most recent right
   timestamp forward onto each left row;
3. filter back to left rows.

Cost: ONE shuffle on the key (the window sort), versus the naive
inequality-join which is a per-key cross product. Ordering (ts, tag) makes
ties deterministic: a right row at exactly the left row's timestamp sorts
first and therefore matches (ASOF's ``<=``).

Skew note: a hot key serializes inside its window partition; if one key
dominates, pre-split by coarse time range and stitch (the standard
fix), or filter the hot key into a broadcast path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    key: str,
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: left rows + most-recent right row's columns
    (``{on}{suffix}`` plus ``right_value_cols``) with right.ts <= left.ts,
    per key. Unmatched left rows keep NULLs."""
    value_cols = right_value_cols or []
    tag = "__asof_tag"

    left_tagged = left.withColumn(tag, F.lit(1))
    right_tagged = right.select(
        F.col(key),
        F.col(on),
        *[F.col(c) for c in value_cols],
    ).withColumn(tag, F.lit(0))

    # align schemas for the union: left contributes its own columns, right
    # rows carry the payload columns to be propagated
    carry = [f"{on}{suffix}"] + [f"{c}{suffix}" for c in value_cols]
    right_aligned = right_tagged.select(
        F.col(key),
        F.col(on),
        F.lit(None).cast("long").alias("__left_marker"),
        F.col(on).alias(carry[0]),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(tag),
    )
    left_cols = [c for c in left.columns]
    left_aligned = left_tagged.select(
        F.col(key),
        F.col(on),
        F.monotonically_increasing_id().alias("__left_marker"),
        F.lit(None).cast(dict(right.dtypes)[on]).alias(carry[0]),
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.col(tag),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    right_aligned = right_aligned.select(
        "*", *[F.lit(None).cast(t).alias(f"__l_{c}") for c, t in left.dtypes]
    )

    unioned = left_aligned.unionByName(right_aligned)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(on).asc(), F.col(tag).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__carried_{c}")
            for c in carry
        ],
    )
    out = carried.filter(F.col(tag) == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        *[F.col(f"__carried_{c}").alias(c) for c in carry],
    )
    return out
