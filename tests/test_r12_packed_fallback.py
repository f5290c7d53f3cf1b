"""Round-12 packed-counter hardening (VERDICT r11 items 6 & 7).

``dq_uniqueness`` must DEGRADE, not error, on key domains whose per-key
counts overflow a 7-bit slot: the r12 plan unions the packed 1-row result
(gated on no-carry) with the plain per-key twin (gated on a broadcast
1-row gate that is empty unless a carry was detected) — AQE's
empty-relation propagation collapses the unused branch at runtime, so a
carry answers exactly through the per-key plan instead of raising.
``dq_unique_proportion`` stays on the plain per-key plan (its packed
variant was rejected on measurement — OPTIMIZATION_r12.md §2); the tests
here pin that high-duplication and mixed domains answer exactly through
the standalone query either way.
"""

from __future__ import annotations

from enterprise_data_quality_platform_spark.queries.dq import (
    dq_unique_proportion,
    dq_uniqueness,
)


def _write_orders(spark, tmp_path, rows, schema):
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / "orders.parquet")
    )


def test_dq_uniqueness_carry_falls_back_exact(spark, tmp_path):
    """A key repeated >127 times trips the 7-bit carry guard; the query
    must return the exact COUNT - COUNT(DISTINCT) answer, not an error."""
    rows = [(7,)] * 130 + [(1,), (2,), (2,), (None,)]
    _write_orders(spark, tmp_path, rows, "o_orderkey long")
    out = dq_uniqueness(spark, str(tmp_path)).collect()
    assert len(out) == 1
    # non-null rows = 133, distinct keys = {7, 1, 2} = 3
    assert out[0].duplicate_rows == 133 - 3
    assert out[0].distinct_keys == 3


def test_dq_uniqueness_fast_path_negatives_nulls_dupes(spark, tmp_path):
    """Fast path (all counts <= 127): negative keys, NULLs and dupes stay
    exact through the packed (word, slot) mapping."""
    rows = [(-9,), (-9,), (-1,), (0,), (8,), (8,), (8,), (None,), (None,)]
    _write_orders(spark, tmp_path, rows, "o_orderkey long")
    out = dq_uniqueness(spark, str(tmp_path)).collect()
    assert out[0].duplicate_rows == 7 - 4
    assert out[0].distinct_keys == 4


def test_dq_unique_proportion_high_duplication_exact(spark, tmp_path):
    """A key repeated >32767 times (the domain that killed the packed
    variant's 15-bit slots) answers exactly through the standalone query."""
    rows = [(5,)] * 32770 + [(6,), (None,)]
    _write_orders(spark, tmp_path, rows, "o_custkey long")
    out = dq_unique_proportion(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.total, r.n_nonnull, r.n_distinct) == (32772, 32771, 2)
    assert abs(r.unique_ratio - round(2 / 32771, 6)) < 1e-12


def test_dq_unique_proportion_mixed_domain_exact(spark, tmp_path):
    """Mixed domain (negatives, NULLs, dupes) answers exactly."""
    rows = (
        [(k,) for k in (-5, -5, -4, -1, 0, 1, 2, 3, 4, 7, 8)]
        + [(3,)] * 6
        + [(None,)] * 3
    )
    _write_orders(spark, tmp_path, rows, "o_custkey long")
    out = dq_unique_proportion(spark, str(tmp_path)).collect()
    r = out[0]
    # 20 rows, 17 non-null, distinct non-null = {-5,-4,-1,0,1,2,3,4,7,8}=10
    assert (r.total, r.n_nonnull, r.n_distinct) == (20, 17, 10)
    assert abs(r.unique_ratio - round(10 / 17, 6)) < 1e-12
