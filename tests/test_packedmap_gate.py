"""Both sides of the packed-map size gate (VERDICT r8 item 2): below
the 20M-probe-row default the packed-map builds are pure overhead, so
mart_shipping_priority / mart_local_supplier_volume /
mart_small_qty_revenue branch to their plain-join forms — which must be
VALUE-IDENTICAL to the packed forms, and each side must plan the shape
it claims (no word map below the gate, word map above it)."""

from __future__ import annotations

import pytest

from enterprise_data_quality_platform_spark.operators.packedmap import (
    packed_map_worthwhile,
)
from enterprise_data_quality_platform_spark.queries import relational

GATED = [
    "mart_shipping_priority",
    "mart_local_supplier_volume",
    "mart_small_qty_revenue",
]


def test_gate_flips_on_probe_rows(sf_dir):
    # sf0.001 lineitem is ~6k rows — far below the 20M default
    assert not packed_map_worthwhile(sf_dir, "lineitem")
    assert packed_map_worthwhile(sf_dir, "lineitem", min_probe_rows=1)
    # estimation failure (missing table) takes the scale-safe packed path
    assert packed_map_worthwhile("/nonexistent", "lineitem")


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("name", GATED)
def test_gate_sides_value_identical_and_plan_pinned(
    spark, sf_dir, name, monkeypatch
):
    fn = getattr(relational, name)
    monkeypatch.setattr(relational, "packed_map_worthwhile", lambda *a, **k: False)
    plain_df = fn(spark, sf_dir)
    plain_plan = plain_df._jdf.queryExecution().executedPlan().toString()
    plain = _rows(plain_df)
    monkeypatch.setattr(relational, "packed_map_worthwhile", lambda *a, **k: True)
    packed_df = fn(spark, sf_dir)
    packed_plan = packed_df._jdf.queryExecution().executedPlan().toString()
    packed = _rows(packed_df)
    assert plain == packed
    assert plain_df.columns == packed_df.columns
    # the plan pins: the gate's OFF side must not build word maps, the ON
    # side must probe them
    assert "packed_codes" not in plain_plan
    assert "packed_codes" in packed_plan
