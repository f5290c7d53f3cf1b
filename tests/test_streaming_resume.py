"""Streaming checkpoint/restart semantics (SURVEY.md §4.3 "checkpointed
streaming state"): a restarted query resumes from the checkpoint and
processes ONLY newly-arrived files — the property that makes the streaming
DQ gate incremental at 100TB instead of a nightly full rescan."""

from __future__ import annotations

import tempfile

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _write(path, ids, ts0="2024-06-01 10:00:00"):
    pd.DataFrame(
        {
            "event_id": ids,
            "ts": pd.to_datetime([ts0] * len(ids)),
            "user_id": [1] * len(ids),
            "event_type": ["view"] * len(ids),
            "value": [1.0] * len(ids),
            "props": ["{}"] * len(ids),
        }
    ).astype({"ts": "datetime64[us]"}).to_parquet(path)


def test_restart_processes_only_new_files(spark):
    with tempfile.TemporaryDirectory(prefix="edqp-resume-") as src, \
         tempfile.TemporaryDirectory(prefix="edqp-ck-") as ck:
        batches: dict[int, int] = {}

        def run_once():
            seen = []

            def handle(df, bid):
                seen.append((bid, df.count()))
                batches[bid] = df.count()

            q = (
                spark.readStream.schema(SCHEMA)
                .parquet(src)
                .writeStream.foreachBatch(handle)
                .trigger(availableNow=True)
                .option("checkpointLocation", ck)
                .start()
            )
            q.awaitTermination()
            return seen

        _write(f"{src}/a.parquet", [1, 2, 3])
        first = run_once()
        assert sum(n for _, n in first) == 3

        # new file arrives while the query is DOWN; restart from checkpoint
        _write(f"{src}/b.parquet", [4, 5])
        second = run_once()
        assert sum(n for _, n in second) == 2  # only the new file's rows

        # nothing new → restart is a no-op (no reprocessing)
        third = run_once()
        assert sum(n for _, n in third) == 0
