"""DuckDB-oracle differential tests — the primary gate (SURVEY.md §5.2.1).

Mirrors the driver's comparison (row count + schema + order-insensitive
values) for every declared query, at sf0.001 for speed; tools/parity.py runs
the same at sf0.01 (the driver's sf).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.parity import compare  # noqa: E402

from enterprise_data_quality_platform_spark.catalog import TABLES  # noqa: E402
from enterprise_data_quality_platform_spark.queries import all_queries  # noqa: E402

from conftest import SF_SMALL  # noqa: E402

SPECS = all_queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_oracle_parity(name, spark, duck):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_SMALL).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only contract: runs and returns a frame
        return
    # bind file-path oracles ({SF_PARQUET_DIR}, e.g. parquet_metadata
    # table functions) to this suite's tier, same as registry.oracle_sqls
    ddf = duck.execute(
        spec.oracle.replace("{SF_PARQUET_DIR}", SF_SMALL.rstrip("/"))
    ).fetchdf()
    issues = compare(name, sdf, ddf)
    assert not issues, f"{name}: {issues}"
