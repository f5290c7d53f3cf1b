"""Declared query registry (SURVEY.md §2.7).

Every implemented operator is exposed as a named query: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB oracle
SQL string computing the same result with the same column names. The driver
compares the two at sf0.01 (row count + schema + order-insensitive value
hash); tests/test_parity.py runs the same comparison locally.
"""

from .registry import QuerySpec, all_queries, oracle_sqls, query_fns

__all__ = ["QuerySpec", "all_queries", "query_fns", "oracle_sqls"]
