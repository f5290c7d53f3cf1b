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

import math

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


def _sql_literal(v) -> str | None:
    """SQL-literal encoding for pushable filter values; None = unsupported."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # NaN/Infinity repr() as bare nan/inf — invalid DuckDB literals
        # that would fail the warehouse query at scan time. Leave such
        # filters residual; Spark evaluates them post-scan.
        return repr(v) if math.isfinite(v) else None
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return None


class DuckDBTableReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema_ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
        )
        self.options = options
        self.cols = ", ".join(f.name for f in schema.fields)
        self.col_names = {f.name for f in schema.fields}
        self.pushed_where: list[str] = []

    def pushFilters(self, filters):
        """Predicate pushdown (Spark 4.1 Python Data Source API): translate
        comparison/IN/NULL filters into WHERE fragments the warehouse
        evaluates, so only matching rows ever cross the Arrow boundary —
        the JDBC-source behavior, and the part of the 100 TB story a
        Python connector usually loses. Unsupported shapes are yielded
        back for Spark to evaluate post-scan."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            IsNull,
            LessThan,
            LessThanOrEqual,
            StringContains,
            StringEndsWith,
            StringStartsWith,
        )

        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
        }
        for f in filters:
            frag = None
            # Not/compound filters carry no .attribute — residual by shape
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr is not None and len(attr) == 1 else None
            if col is not None and col in self.col_names:
                qc = f'"{col}"'
                if type(f) in ops:
                    lit = _sql_literal(f.value)
                    if lit is not None:
                        frag = f"{qc} {ops[type(f)]} {lit}"
                elif isinstance(f, In):
                    lits = [_sql_literal(v) for v in f.value]
                    if lits and all(x is not None for x in lits):
                        frag = f"{qc} IN ({', '.join(lits)})"
                elif isinstance(f, IsNull):
                    frag = f"{qc} IS NULL"
                elif isinstance(f, IsNotNull):
                    frag = f"{qc} IS NOT NULL"
                elif isinstance(f, StringStartsWith):
                    frag = f"starts_with({qc}, {_sql_literal(f.value)})"
                elif isinstance(f, StringEndsWith):
                    frag = f"suffix({qc}, {_sql_literal(f.value)})"
                elif isinstance(f, StringContains):
                    frag = f"contains({qc}, {_sql_literal(f.value)})"
            if frag is None:
                yield f  # Spark evaluates it after the scan
            else:
                self.pushed_where.append(frag)

    def partitions(self):
        import duckdb

        pc = self.options.get("partitioncolumn")
        n = int(self.options.get("numpartitions", "1"))
        if not pc or n <= 1:
            return [RangePartition(None, None)]
        rel = _relation_sql(self.options)
        stats_where = (
            f" WHERE {' AND '.join(self.pushed_where)}" if self.pushed_where else ""
        )
        lo, hi = duckdb.connect().execute(
            f"SELECT MIN({pc}), MAX({pc}) FROM {rel}{stats_where}"
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
        conds = list(self.pushed_where)
        if partition.lo is not None:
            # half-open ranges partition exactly; the last one is closed
            # at hi+1 so MAX lands somewhere
            conds.append(f"{pc} >= {partition.lo} AND {pc} < {partition.hi}")
        where = f" WHERE {' AND '.join(conds)}" if conds else ""
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
    # runtime conf; without it Spark refuses a reader that implements
    # pushFilters (DATA_SOURCE_PUSHDOWN_DISABLED) — set at registration so
    # the connector works on a vanilla session (the driver's situation)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DuckDBTableSource)
