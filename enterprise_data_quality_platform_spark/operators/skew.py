"""Skew-mitigation operators: salted joins and salted aggregation.

``dq_key_skew`` is the diagnostic (top-key share / multiple-of-mean);
these are the remedy when a shuffle key is too hot for one task. AQE's
skew-join splitting handles most sort-merge cases at runtime
(``session.py`` enables it), but two shapes still need explicit salting
at 100 TB:

- a shuffled join whose hot key exceeds what AQE will split (or a
  shuffled-hash join, which AQE skew handling does not cover),
- a two-level aggregation where one group receives a large fraction of
  all rows.

Both transformations are pure row-level rewrites — results are exactly
equal to the unsalted form (asserted in tests/test_operators.py), only
the partitioning changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(df: DataFrame, num_salts: int) -> Column:
    """Deterministic per-row salt in [0, num_salts): a hash of the whole
    row, so re-runs place each row in the same salt bucket (keeps
    incremental/idempotent pipelines reproducible — ``F.rand`` would
    not)."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in df.columns]
    return F.pmod(F.xxhash64(*cols), F.lit(num_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the BIG side's hot keys would overload single
    tasks: big rows spread over ``num_salts`` sub-keys, the small side
    replicated once per salt (explode of a ``sequence`` literal — no
    Python, no crossJoin), and the join runs on (key..., salt). Output
    equals ``big.join(small, on, how)`` for inner/left joins; the salt
    column never escapes.

    Cost model: the small side is duplicated ``num_salts``× through the
    shuffle — use for dimension-vs-fact joins where the dimension is too
    big to broadcast but far smaller than the fact; pick num_salts ≈ the
    hot key's multiple-of-mean from ``dq_key_skew``."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_big = big.withColumn("__salt", salt_column(big, num_salts))
    # generators can't be nested in expressions — explode bare, sequence of
    # int literals already yields int elements matching salt_column's type
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salted_big.join(salted_small, on + ["__salt"], how).drop("__salt")


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    num_salts: int = 16,
) -> DataFrame:
    """Two-level salted aggregation for count + sums (the mergeable
    aggregates): level 1 groups by (keys..., salt) so a hot group's rows
    split across ``num_salts`` tasks; level 2 merges the ≤ num_salts
    partials per group. Spark's map-side partial aggregation already
    handles MOST skew (each task pre-combines its rows); explicit
    salting matters when the FINAL-stage group is still too big — e.g.
    high-cardinality sum columns behind one group, or when combining
    with exact-distinct rewrites. Result equals
    ``df.groupBy(keys).agg(count, sum...)`` exactly (integer/decimal
    sums; float sums would be order-sensitive either way)."""
    lvl1 = (
        df.withColumn("__salt", salt_column(df, num_salts))
        .groupBy(*keys, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
        )
    )
    return lvl1.groupBy(*keys).agg(
        F.sum("__n").alias("n_rows"),
        *[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )
