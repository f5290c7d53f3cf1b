"""Cross-engine deterministic numeric helpers.

Why not plain ROUND / CAST(... AS DECIMAL)? Spark rounds a double via its
*shortest decimal representation* (Java ``BigDecimal.valueOf``), DuckDB
rounds the *binary value*; when a value's shortest repr sits on a rounding
boundary (e.g. 1222.745 stored as 1222.74499999...) the two engines disagree
by one cent. Both classes of helper below use only IEEE double ops + integer
``floor``, which every engine evaluates identically:

- ``fx_round(x, s)``  = floor(x * 10^s + 0.5) / 10^s  (half-up, positive x)
- ``fx_sum``: per-row fixed-point quantization to 1e-4, exact integer SUM
  (order- and partition-independent), then one deterministic final round.

The integer-cents path holds to ~9e14 absolute sums (2^53 / 1e4); beyond
that (true 100TB sums) switch to DECIMAL aggregation — the checks compiler
uses DECIMAL; these helpers exist for oracle-exact parity in the declared
queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: fixed-point quantum for money-ish doubles
_Q = 10_000


def fx_round(col: Column, scale: int = 2) -> Column:
    """Deterministic half-up round for positive doubles; bit-identical to
    the SQL twin ``sql_round``."""
    m = 10**scale
    return F.floor(col * m + F.lit(0.5)) / F.lit(float(m))


def sql_round(expr: str, scale: int = 2) -> str:
    m = 10**scale
    return f"FLOOR(({expr}) * {m} + 0.5) / {m}.0"


def fx_units(col: Column) -> Column:
    """Quantize a money double to integer 1e-4 units — the partial-sum
    representation for multi-level aggregations (sums of unit-sums stay
    exact and order-independent)."""
    return F.floor(col * _Q + F.lit(0.5)).cast("long")


def fx_from_units(unit_sum: Column, scale: int = 2) -> Column:
    """Final rounding of an (exact) unit sum back to a double."""
    return fx_round(unit_sum / F.lit(float(_Q)), scale)


def fx_sum(col: Column, alias: str, scale: int = 2) -> Column:
    """Order-independent rounded sum: quantize rows to integer 1e-4 units,
    sum exactly as longs, round once."""
    units = F.floor(col * _Q + F.lit(0.5)).cast("long")
    return fx_round(F.sum(units) / F.lit(float(_Q)), scale).alias(alias)


def sql_sum(expr: str, scale: int = 2) -> str:
    inner = f"SUM(CAST(FLOOR(({expr}) * {_Q} + 0.5) AS BIGINT)) / {_Q}.0"
    return sql_round(inner, scale)


def fx_avg(col: Column, alias: str, scale: int = 4) -> Column:
    """Order-independent rounded mean over non-null values."""
    units = F.floor(col * _Q + F.lit(0.5)).cast("long")
    return fx_round(F.sum(units) / F.lit(float(_Q)) / F.count(col), scale).alias(alias)


def sql_avg(expr: str, count_expr: str | None = None, scale: int = 4) -> str:
    c = count_expr or expr
    inner = f"SUM(CAST(FLOOR(({expr}) * {_Q} + 0.5) AS BIGINT)) / {_Q}.0 / COUNT({c})"
    return sql_round(inner, scale)
