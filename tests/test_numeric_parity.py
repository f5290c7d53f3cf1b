"""Cross-engine property test for the fixed-point numeric helpers — the
foundation every oracle-checked money aggregate stands on. Fuzzes thousands
of doubles (uniform, heavy-tailed, and rounding-boundary-adjacent) through
Spark AND DuckDB forms and requires bitwise-equal results."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from enterprise_data_quality_platform_spark.functions.numeric import (
    fx_avg,
    fx_round,
    fx_sum,
    sql_avg,
    sql_round,
    sql_sum,
)


def _values() -> np.ndarray:
    rng = np.random.default_rng(1234)
    uniform = rng.uniform(0, 1e6, 2000)
    heavy = np.abs(rng.standard_cauchy(1000)) * 100
    heavy = heavy[heavy < 1e9]
    # values engineered near .xx5 / .xxxx5 rounding boundaries
    cents = rng.integers(0, 10_000_000, 1000) / 100 + 0.005
    tenths = rng.integers(0, 1_000_000, 1000) / 10000 + 0.00005
    return np.concatenate([uniform, heavy, cents, tenths])


def test_fx_round_matches_duckdb(spark):
    vals = _values()
    pdf = pd.DataFrame({"x": vals})
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(fx_round(F.col("x"), 2).alias("r2"), fx_round(F.col("x"), 4).alias("r4"))
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT {sql_round('x', 2)} AS r2, {sql_round('x', 4)} AS r4 FROM t"
    ).fetchdf()
    assert np.array_equal(got["r2"].to_numpy(), want["r2"].to_numpy())
    assert np.array_equal(got["r4"].to_numpy(), want["r4"].to_numpy())


def test_fx_sum_avg_match_duckdb_and_partitioning(spark):
    vals = _values()
    pdf = pd.DataFrame({"x": vals})
    sdf = spark.createDataFrame(pdf)
    got = sdf.agg(fx_sum(F.col("x"), "s"), fx_avg(F.col("x"), "a")).collect()[0]
    # partition-independence: same result from any repartitioning
    got13 = (
        sdf.repartition(13).agg(fx_sum(F.col("x"), "s"), fx_avg(F.col("x"), "a"))
        .collect()[0]
    )
    assert (got.s, got.a) == (got13.s, got13.a)
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT {sql_sum('x')} AS s, {sql_avg('x')} AS a FROM t"
    ).fetchone()
    assert got.s == want[0]
    assert got.a == want[1]
