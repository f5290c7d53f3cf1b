from .readers import read_table, read_csv, read_json, read_parquet
from .writers import write_partitioned, materialize_model

__all__ = [
    "read_table",
    "read_csv",
    "read_json",
    "read_parquet",
    "write_partitioned",
    "materialize_model",
]
