"""Tests for the custom Python Data Source (sources/duckdb_source.py):
range-partitioned warehouse reads via the Spark 4 DataSource API."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL

from enterprise_data_quality_platform_spark.sources.duckdb_source import (
    register_duckdb_source,
)


@pytest.fixture()
def ds(spark):
    register_duckdb_source(spark)
    return spark


def _read(spark, **options):
    r = spark.read.format("duckdb_table")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def test_rows_match_parquet_exactly(ds):
    """Range partitioning must cover every row exactly once — full-row
    multiset equality against the native parquet read."""
    got = _read(
        ds,
        path=f"{SF_SMALL}/orders.parquet",
        partitionColumn="o_orderkey",
        numPartitions="4",
    )
    ref = ds.read.parquet(f"{SF_SMALL}/orders.parquet")
    assert got.rdd.getNumPartitions() == 4
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_schema_inferred_from_warehouse(ds):
    df = _read(ds, path=f"{SF_SMALL}/orders.parquet")
    assert [f.name for f in df.schema.fields] == [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    assert df.schema["o_orderdate"].dataType.simpleString() == "timestamp_ntz"


def test_query_option_pushes_work_to_warehouse(ds):
    """The ``query`` option ships arbitrary SQL to DuckDB — filters and
    projections run warehouse-side before any row reaches Spark."""
    df = _read(
        ds,
        query=(
            f"SELECT o_orderkey, o_totalprice FROM "
            f"read_parquet('{SF_SMALL}/orders.parquet') WHERE o_totalprice > 100000"
        ),
    )
    ref = (
        ds.read.parquet(f"{SF_SMALL}/orders.parquet")
        .filter(F.col("o_totalprice") > 100000)
        .select("o_orderkey", "o_totalprice")
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, ref.collect()))


def test_empty_relation_single_partition(ds):
    df = _read(
        ds,
        query=(
            f"SELECT o_orderkey FROM read_parquet('{SF_SMALL}/orders.parquet') "
            "WHERE o_orderkey < 0"
        ),
        partitionColumn="o_orderkey",
        numPartitions="8",
    )
    assert df.count() == 0


def test_skewed_range_still_complete(ds):
    """Range splits are value-based, not row-count-based: a partition
    column with gaps/skew must still produce a complete read."""
    got = _read(
        ds,
        path=f"{SF_SMALL}/events.parquet",
        partitionColumn="user_id",  # heavily repeated values
        numPartitions="8",
    )
    ref = ds.read.parquet(f"{SF_SMALL}/events.parquet")
    assert got.count() == ref.count()
    assert (
        got.agg(F.sum("event_id")).collect()[0][0]
        == ref.agg(F.sum("event_id")).collect()[0][0]
    )


def test_filter_pushdown_correct_and_bookkept(ds):
    """pushFilters: comparison/IN/null predicates evaluate warehouse-side —
    results equal the native filtered read, and partition range stats
    respect the pushed predicates (tighter ranges on filtered keys)."""
    got = _read(
        ds,
        path=f"{SF_SMALL}/orders.parquet",
        partitionColumn="o_orderkey",
        numPartitions="4",
    ).filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000.0))
    ref = (
        ds.read.parquet(f"{SF_SMALL}/orders.parquet")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000.0))
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_push_filters_unit_translation():
    """Unit-level: supported filters become WHERE fragments, unsupported
    shapes are yielded back for Spark to evaluate."""
    from pyspark.sql.datasource import EqualTo, In, IsNotNull, Not, StringStartsWith
    from pyspark.sql.types import StructType, StructField, StringType, LongType

    from enterprise_data_quality_platform_spark.sources.duckdb_source import (
        DuckDBTableReader,
    )

    schema = StructType(
        [StructField("a", LongType()), StructField("s", StringType())]
    )
    r = DuckDBTableReader(schema, {"path": "x.parquet"})
    residual = list(
        r.pushFilters(
            [
                EqualTo(("a",), 1),
                In(("s",), ("x", "o'brien")),
                IsNotNull(("s",)),
                StringStartsWith(("s",), "pre"),
                Not(EqualTo(("a",), 2)),  # unsupported -> residual
                EqualTo(("missing",), 3),  # unknown column -> residual
            ]
        )
    )
    assert len(residual) == 2
    assert r.pushed_where == [
        '"a" = 1',
        "\"s\" IN ('x', 'o''brien')",
        '"s" IS NOT NULL',
        "starts_with(\"s\", 'pre')",
    ]


def test_nonfinite_float_filters_stay_residual():
    """ADVICE r5: repr(nan)/repr(inf) are invalid DuckDB literals — a
    pushed comparison against a non-finite value must be yielded back as
    a residual filter, not crash the warehouse query at scan time."""
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import StructType, StructField, DoubleType

    from enterprise_data_quality_platform_spark.sources.duckdb_source import (
        DuckDBTableReader,
        _sql_literal,
    )

    assert _sql_literal(float("nan")) is None
    assert _sql_literal(float("inf")) is None
    assert _sql_literal(float("-inf")) is None
    assert _sql_literal(1.5) == "1.5"

    schema = StructType([StructField("x", DoubleType())])
    r = DuckDBTableReader(schema, {"path": "x.parquet"})
    residual = list(
        r.pushFilters([EqualTo(("x",), float("nan")), EqualTo(("x",), 2.0)])
    )
    assert len(residual) == 1  # the NaN comparison came back
    assert r.pushed_where == ['"x" = 2.0']
