"""GE-style checkpoints (S7): named suite×tables binding, persisted like a
suite, executable by name — round-trip, action order, gate behavior."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from enterprise_data_quality_platform_spark.checks import (
    Check,
    Checkpoint,
    ValidationGateError,
    load_checkpoint,
    run_checkpoint,
    save_checkpoint,
)
from enterprise_data_quality_platform_spark.checks.suite_io import save_suite

from conftest import SF_SMALL


def _suite_path(tmp_path, checks):
    p = tmp_path / "expectations" / "suite.json"
    save_suite(checks, str(p), name="cp-suite")
    return str(p)


def _passing_checks():
    return [
        Check("orders nonempty", "row_count_between", "orders", params={"min": 1}),
        Check("custkey not null", "not_null", "orders", column="o_custkey"),
    ]


def test_checkpoint_round_trip(tmp_path):
    cp = Checkpoint(
        name="nightly",
        suite_path="expectations/suite.json",
        sf_dir=SF_SMALL,
        tables=["orders", "nation"],
        validations_path=str(tmp_path / "validations"),
        data_docs_dir=str(tmp_path / "docs"),
        gate=True,
    )
    path = tmp_path / "checkpoints" / "nightly.json"
    save_checkpoint(cp, str(path))
    loaded = load_checkpoint(str(path))
    assert loaded.to_dict() == cp.to_dict()
    # the on-disk form is GE-flavored JSON, human-diffable
    doc = json.loads(path.read_text())
    assert doc["checkpoint_name"] == "nightly"
    assert doc["datasource"]["tables"] == ["orders", "nation"]


def test_run_checkpoint_executes_and_persists(spark, tmp_path):
    cp = Checkpoint(
        name="smoke",
        suite_path=_suite_path(tmp_path, _passing_checks()),
        sf_dir=SF_SMALL,
        tables=["orders"],
        validations_path=str(tmp_path / "validations"),
        data_docs_dir=str(tmp_path / "docs"),
    )
    out = run_checkpoint(spark, cp, run_name="run-1")
    assert out["overall_status"] == "pass" and out["total"] == 2
    # validations store has one row per check, tagged with the run
    store = spark.read.parquet(str(tmp_path / "validations"))
    rows = store.collect()
    assert len(rows) == 2 and all(r.run_name == "run-1" for r in rows)
    # docs rendered: current page + history page
    assert (tmp_path / "docs" / "smoke.html").exists()
    assert (tmp_path / "docs" / "smoke_history.html").exists()
    # second run appends, history accumulates
    run_checkpoint(spark, cp, run_name="run-2")
    assert spark.read.parquet(str(tmp_path / "validations")).count() == 4


def test_gate_raises_after_persisting(spark, tmp_path):
    failing = [
        Check(
            "impossible rowcount",
            "row_count_between",
            "orders",
            params={"min": 10**12},
        )
    ]
    cp = Checkpoint(
        name="gated",
        suite_path=_suite_path(tmp_path, failing),
        sf_dir=SF_SMALL,
        tables=["orders"],
        validations_path=str(tmp_path / "validations"),
        gate=True,
    )
    with pytest.raises(ValidationGateError):
        run_checkpoint(spark, cp, run_name="run-x")
    # the reference's order: results persist BEFORE the raise
    store = spark.read.parquet(str(tmp_path / "validations"))
    assert store.filter(store.status != "pass").count() == 1


def test_default_run_name(spark, tmp_path):
    cp = Checkpoint(
        name="unnamed-run",
        suite_path=_suite_path(tmp_path, _passing_checks()),
        sf_dir=SF_SMALL,
        tables=["orders"],
        validations_path=str(tmp_path / "validations"),
    )
    out = run_checkpoint(spark, cp)
    assert out["run_name"] == "unnamed-run-run"
