"""Custom STREAMING Python Data Source (Spark 4 API): an offset-tracked
JSONL replay source — the sandbox stand-in for a Kafka topic with real
exactly-once offset semantics, completing the source story next to the
batch ``duckdb_table`` connector (duckdb_source.py) and the config-only
Kafka wiring (streaming/pipeline.py::kafka_events_stream).

Offsets are line numbers: ``initialOffset`` starts at 0 (or the
``startingLine`` option), each micro-batch reads up to ``maxLinesPerBatch``
new lines, and ``readBetweenOffsets`` replays any [start, end) range for
recovery — so checkpoint/restart resumes exactly where it stopped (tested).
Malformed lines become null-id rows (drop or quarantine downstream, same
policy as parse_kafka_events).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

#: default wire schema — matches streaming/pipeline.py::EVENTS_WIRE_SCHEMA
#: minus the string-typed ts (offset-source tests don't need event time).
DEFAULT_SCHEMA = (
    "event_id long, user_id long, event_type string, value double"
)


class JsonlStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_replay needs a 'path' option")
        self.start_line = int(options.get("startingline", "0"))
        self.max_lines = int(options.get("maxlinesperbatch", "10000"))
        self.fields = [
            f.strip().split()[0]
            for f in options.get("schema", DEFAULT_SCHEMA).split(",")
        ]

    def initialOffset(self) -> dict:
        return {"line": self.start_line}

    def _rows(self, lo: int, hi: int | None):
        with open(self.path) as fh:
            for i, line in enumerate(fh):
                if i < lo:
                    continue
                if hi is not None and i >= hi:
                    break
                try:
                    rec = json.loads(line)
                    yield tuple(rec.get(f) for f in self.fields)
                except (json.JSONDecodeError, AttributeError):
                    yield tuple(None for _ in self.fields)

    def read(self, start: dict):
        lo = start["line"]
        try:
            with open(self.path) as fh:
                n_total = sum(1 for _ in fh)
        except FileNotFoundError:
            return iter([]), {"line": lo}
        hi = min(n_total, lo + self.max_lines)
        if hi <= lo:
            return iter([]), {"line": lo}
        # a LIST iterator, not a generator: the prefetch cache both
        # advances (add_result_to_cache) and pickles/copies the returned
        # iterator (getCache) — list_iterator supports both, generators
        # neither; maxLinesPerBatch bounds the materialized memory
        return iter(list(self._rows(lo, hi))), {"line": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(start["line"], end["line"])))


class JsonlReplaySource(DataSource):
    """``spark.readStream.format("jsonl_replay")`` after
    ``spark.dataSource.register(JsonlReplaySource)``. Options: ``path``
    (the JSONL file), ``schema`` (DDL, default events-shaped),
    ``maxLinesPerBatch`` (per-micro-batch intake bound — the
    maxOffsetsPerTrigger analogue), ``startingLine``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_replay"

    def schema(self) -> str:
        return self.options.get("schema", DEFAULT_SCHEMA)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return JsonlStreamReader(self.options)


def register_jsonl_stream_source(spark) -> None:
    spark.dataSource.register(JsonlReplaySource)
