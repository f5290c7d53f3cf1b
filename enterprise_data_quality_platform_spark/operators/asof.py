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

Skew: a hot key serializes inside its window partition.
``split_hot_keys=True`` applies the standard coarse-time-range pre-split:
the window partitions on (key, time-slice) instead of bare (key), and each
slice is seeded with a synthetic "carry-in" row — the most recent right row
from ALL earlier slices (computed on the tiny per-(key,slice) aggregate
frame, one row per key x slice). Identical answers; no window partition
ever holds more than one slice of one key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _slice_of(col: Column, dtype: str, slice_seconds: int) -> Column:
    """Coarse time-slice index for a timestamp-like column."""
    if dtype.startswith("timestamp"):
        return F.floor(F.unix_timestamp(col) / slice_seconds).cast("long")
    # numeric epoch (e.g. raw nanos read with nanosAsLong)
    return F.floor(col / F.lit(slice_seconds)).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    key: str,
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
    split_hot_keys: bool = False,
    slice_seconds: int = 86400,
) -> DataFrame:
    """Backward as-of join: left rows + most-recent right row's columns
    (``{on}{suffix}`` plus ``right_value_cols``) with right.ts <= left.ts,
    per key. Unmatched left rows keep NULLs.

    ``split_hot_keys``: partition the carry-forward window by
    (key, floor(ts / slice_seconds)) and stitch slices with per-slice
    carry-in rows, so a key owning half the table can't pin its whole
    timeline on one task.
    """
    value_cols = right_value_cols or []
    tag = "__asof_tag"
    on_type = dict(right.dtypes)[on]

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
        F.lit(None).cast(on_type).alias(carry[0]),
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

    part_cols = [key]
    if split_hot_keys:
        sl = lambda c: _slice_of(c, on_type, slice_seconds)  # noqa: E731

        left_aligned = left_aligned.withColumn("__slice", sl(F.col(on)))
        right_aligned = right_aligned.withColumn("__slice", sl(F.col(on)))

        # per-(key, slice) most recent right row — a grouped aggregate with
        # map-side partials, never a wide window. max over the (ts, values)
        # struct is the deterministic "latest" pick.
        r_slim = right.select(F.col(key), F.col(on), *[F.col(c) for c in value_cols])
        last_per_slice = (
            r_slim.withColumn("__slice", sl(F.col(on)))
            .groupBy(key, "__slice")
            .agg(
                F.max(
                    F.struct(
                        F.col(on).alias("__on"),
                        *[F.col(c).alias(c) for c in value_cols],
                    )
                ).alias("__last")
            )
        )
        # timeline: one row per (key, slice) present on either side; the
        # carry-in for slice s = latest right row of any slice < s,
        # computed with a window over the per-slice frame (rows per key =
        # number of slices, bounded by time range / slice_seconds).
        left_slices = (
            left.select(F.col(key), sl(F.col(on)).alias("__slice")).distinct()
        )
        timeline = left_slices.join(
            last_per_slice, on=[key, "__slice"], how="full_outer"
        )
        w_tl = (
            Window.partitionBy(key)
            .orderBy("__slice")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry_rows = (
            timeline.withColumn(
                "__carry", F.last("__last", ignorenulls=True).over(w_tl)
            )
            .join(left_slices, on=[key, "__slice"], how="left_semi")
            .filter(F.col("__carry").isNotNull())
        )
        carry_aligned = carry_rows.select(
            F.col(key),
            F.col("__carry.__on").alias(on),
            F.lit(None).cast("long").alias("__left_marker"),
            F.col("__carry.__on").alias(carry[0]),
            *[F.col(f"__carry.{c}").alias(f"{c}{suffix}") for c in value_cols],
            F.lit(0).alias(tag),
            *[F.lit(None).cast(t).alias(f"__l_{c}") for c, t in left.dtypes],
            F.col("__slice"),
        )
        right_aligned = right_aligned.unionByName(carry_aligned)
        part_cols.append("__slice")

    unioned = left_aligned.unionByName(right_aligned)
    w = (
        Window.partitionBy(*part_cols)
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
