"""Custom Python Data Source (Spark 4 API): a warehouse-table reader over
DuckDB — the stand-in for the reference's BigQuery table source
(``/root/reference/airflow/dags/pager-workflow.py`` reads
``adventureworks.sales_*`` straight from the warehouse; SURVEY.md §2.1 S1).

Design follows the public JDBC-source pattern: RANGE-PARTITIONED reads on a
numeric column — planning computes [min, max] once, splits it into N
half-open ranges, and each Spark task runs an independent ``WHERE pc >= lo
AND pc < hi`` query, so the scan parallelizes across executors exactly like
Spark's own JDBC partitioning options (partitionColumn/numPartitions).
Rows move as Arrow RecordBatches (DuckDB ``fetch_record_batch`` → Spark's
arrow path), never per-row Python objects.

At 100 TB the same shape holds: the warehouse does the range filter
(predicate pushdown by construction), each executor holds one cursor, and
no driver-side collect exists — planning reads only a 1-row MIN/MAX.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: duckdb -> Spark DDL type map (the columns our tables use)
_TYPES = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "TIMESTAMP": "timestamp_ntz",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "BOOLEAN": "boolean",
    "DATE": "date",
}


def _relation_sql(options: dict) -> str:
    """The FROM-clause target: a parquet path (read_parquet) or an
    arbitrary subquery via the ``query`` option."""
    if options.get("query"):
        return f"({options['query']})"
    path = options.get("path")
    if not path:
        raise ValueError("duckdb source needs 'path' or 'query' option")
    return f"read_parquet('{path}')"


class RangePartition(InputPartition):
    def __init__(self, lo, hi):
        self.lo, self.hi = lo, hi


class DuckDBTableReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema_ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
        )
        self.options = options
        self.cols = ", ".join(f.name for f in schema.fields)

    def partitions(self):
        import duckdb

        pc = self.options.get("partitioncolumn")
        n = int(self.options.get("numpartitions", "1"))
        if not pc or n <= 1:
            return [RangePartition(None, None)]
        rel = _relation_sql(self.options)
        lo, hi = duckdb.connect().execute(
            f"SELECT MIN({pc}), MAX({pc}) FROM {rel}"
        ).fetchone()
        if lo is None:  # empty table
            return [RangePartition(None, None)]
        lo, hi = int(lo), int(hi)
        step = max(1, (hi - lo + 1 + n - 1) // n)
        bounds = list(range(lo, hi + 1, step)) + [hi + 1]
        return [
            RangePartition(bounds[i], bounds[i + 1])
            for i in range(len(bounds) - 1)
        ]

    def read(self, partition: RangePartition):
        import duckdb

        rel = _relation_sql(self.options)
        pc = self.options.get("partitioncolumn")
        where = ""
        if partition.lo is not None:
            # half-open ranges partition exactly; the last one is closed
            # at hi+1 so MAX lands somewhere
            where = f" WHERE {pc} >= {partition.lo} AND {pc} < {partition.hi}"
        cur = duckdb.connect().execute(
            f"SELECT {self.cols} FROM {rel}{where}"
        )
        reader = cur.fetch_record_batch(100_000)
        while True:
            try:
                yield reader.read_next_batch()
            except StopIteration:
                return


class DuckDBTableSource(DataSource):
    """``spark.read.format("duckdb_table")`` after
    ``spark.dataSource.register(DuckDBTableSource)``.

    Options: ``path`` (parquet file/glob) or ``query`` (any DuckDB SQL),
    ``partitionColumn`` + ``numPartitions`` for range-parallel reads,
    ``schema`` optional override (DDL string) — otherwise inferred from
    the warehouse via DESCRIBE at plan time."""

    @classmethod
    def name(cls) -> str:
        return "duckdb_table"

    def schema(self) -> str:
        import duckdb

        rel = _relation_sql(self.options)
        if self.options.get("schema"):
            return self.options["schema"]
        rows = duckdb.connect().execute(f"DESCRIBE SELECT * FROM {rel}").fetchall()
        cols = []
        for name, dtype, *_ in rows:
            base = dtype.upper()
            if base.endswith("[]") or base.startswith("STRUCT"):
                raise ValueError(f"unsupported nested type for {name}: {dtype}")
            cols.append(f"{name} {_TYPES.get(base, 'string')}")
        return ", ".join(cols)

    def reader(self, schema) -> DataSourceReader:
        return DuckDBTableReader(schema, self.options)


def register_duckdb_source(spark) -> None:
    spark.dataSource.register(DuckDBTableSource)
