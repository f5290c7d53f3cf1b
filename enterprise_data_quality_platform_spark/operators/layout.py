"""Z-order (Morton) data layout — multi-dimensional clustering so file-level
min/max statistics prune on EVERY interleaved dimension, not just the sort
prefix (the OPTIMIZE ZORDER BY pattern from the Delta/Iceberg world, built
from plain Spark primitives: an exact bit-interleave expression +
repartitionByRange + sortWithinPartitions).

Why it matters at 100 TB: a linear sort on (user, hour) prunes user
predicates only; Z-ordering bounds BOTH value ranges inside each output
file, so a scan filtered on either dimension (or both) skips most files.
The z-value is computed with whole-stage-codegen integer bit math — no UDF
— and is engine-portable (same shifts/masks work in any SQL engine), so
the layout decision itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    result bit 2i   = bit i of ``a``,
    result bit 2i+1 = bit i of ``b``.
    Pure shifts/masks — exact, deterministic, codegen-friendly."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def zorder_by(
    df: DataFrame,
    a: Column,
    b: Column,
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` by the Morton order of (a, b): range-partition on the
    z-value, then sort within partitions, so each output file covers a
    small hyper-rectangle of (a, b) space. Writers downstream inherit the
    layout; parquet min/max on a AND b both become selective."""
    zed = df.withColumn("__z", interleave_bits(a, b, bits))
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    return (
        zed.repartitionByRange(int(parts), F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
