from .duckdb_source import register_duckdb_source
from .jsonl_stream_source import register_jsonl_stream_source
from .readers import read_table, read_csv, read_json, read_parquet
from .writers import (
    materialize_incremental,
    materialize_model,
    merge_upsert,
    write_clustered,
    write_partitioned,
    write_violations,
)

__all__ = [
    "register_duckdb_source",
    "register_jsonl_stream_source",
    "read_table",
    "read_csv",
    "read_json",
    "read_parquet",
    "write_partitioned",
    "materialize_model",
    "materialize_incremental",
    "merge_upsert",
    "write_clustered",
    "write_violations",
]
