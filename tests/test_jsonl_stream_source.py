"""Tests for the custom streaming Python Data Source
(sources/jsonl_stream_source.py): offset tracking, bounded micro-batches,
exactly-once checkpoint resume, malformed-line policy."""

from __future__ import annotations

import json

import pytest

from enterprise_data_quality_platform_spark.sources.jsonl_stream_source import (
    register_jsonl_stream_source,
)


@pytest.fixture()
def ds(spark):
    register_jsonl_stream_source(spark)
    return spark


def _write(path, lo, hi, mode="a"):
    with open(path, mode) as fh:
        for i in range(lo, hi):
            fh.write(
                json.dumps(
                    {
                        "event_id": i,
                        "user_id": i % 3,
                        "event_type": "view",
                        "value": float(i),
                    }
                )
                + "\n"
            )


def test_offsets_advance_and_batches_are_bounded(ds, tmp_path):
    path = str(tmp_path / "e.jsonl")
    _write(path, 0, 25, mode="w")
    q = (
        ds.readStream.format("jsonl_replay")
        .option("path", path)
        .option("maxLinesPerBatch", "10")
        .load()
        .writeStream.format("memory")
        .queryName("jsonl_offsets_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    assert ds.table("jsonl_offsets_t").count() == 25
    # intake bound: no micro-batch exceeded maxLinesPerBatch
    batch_rows = [p["numInputRows"] for p in q.recentProgress]
    assert max(batch_rows) <= 10 and sum(batch_rows) == 25
    # tail growth: only the NEW lines flow (offset tracking)
    _write(path, 25, 30)
    q.processAllAvailable()
    assert ds.table("jsonl_offsets_t").count() == 30
    q.stop()


def test_checkpoint_resume_is_exactly_once(ds, tmp_path):
    path = str(tmp_path / "e.jsonl")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            ds.readStream.format("jsonl_replay")
            .option("path", path)
            .option("maxLinesPerBatch", "10")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    _write(path, 0, 25, mode="w")
    run_once()
    assert ds.read.parquet(out).count() == 25
    _write(path, 25, 33)
    run_once()  # restart from checkpoint
    ids = sorted(r.event_id for r in ds.read.parquet(out).collect())
    assert ids == list(range(33))  # no loss, no duplicates


def test_malformed_lines_become_null_rows(ds, tmp_path):
    path = str(tmp_path / "e.jsonl")
    _write(path, 0, 3, mode="w")
    with open(path, "a") as fh:
        fh.write("not json at all\n")
    q = (
        ds.readStream.format("jsonl_replay")
        .option("path", path)
        .load()
        .writeStream.format("memory")
        .queryName("jsonl_corrupt_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    rows = ds.table("jsonl_corrupt_t").collect()
    q.stop()
    assert len(rows) == 4
    assert sum(1 for r in rows if r.event_id is None) == 1


def test_starting_line_option(ds, tmp_path):
    path = str(tmp_path / "e.jsonl")
    _write(path, 0, 20, mode="w")
    q = (
        ds.readStream.format("jsonl_replay")
        .option("path", path)
        .option("startingLine", "15")
        .load()
        .writeStream.format("memory")
        .queryName("jsonl_start_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    ids = sorted(r.event_id for r in ds.table("jsonl_start_t").collect())
    q.stop()
    assert ids == list(range(15, 20))
