"""Incremental dedup (dedup/incremental.py): exact/near/kept decisions on
crafted shards, state parquet round-trip, idempotent re-ingest, and
determinism under repartitioning — the semantics the rows-only
``dedup_incremental_shard`` driver check can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from enterprise_data_quality_platform_spark.dedup.incremental import (
    build_dedup_state,
    incremental_dedup,
    read_dedup_state,
    updated_state,
    write_dedup_state,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to hide from every single hunter nearby"
)
OTHER = (
    "completely different content about databases and distributed systems "
    "with partitioned shuffles broadcast joins and adaptive execution plans"
)
FRESH = (
    "an entirely novel document mentioning volcanoes glaciers and tides "
    "that shares no phrasing with anything previously ingested here"
)


def _corpus(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, OTHER)], ["doc_id", "text"]
    )


def _shard(spark):
    # 101 = exact dup of 1 (whitespace/case differences only — the
    # normalized fingerprint is identical); 102 = near dup of 1 (one word
    # changed); 103 = fresh
    near = BASE.replace("hunter", "ranger")
    return spark.createDataFrame(
        [(101, "  " + BASE.upper() + "  "), (102, near), (103, FRESH)],
        ["doc_id", "text"],
    )


def test_incremental_decisions(spark):
    state = build_dedup_state(_corpus(spark))
    kept, report = incremental_dedup(_shard(spark), state, threshold=0.5)
    rep = {r.doc_id: r for r in report.collect()}
    assert rep[101].reason == "exact_dup" and rep[101].matched_id == 1
    assert rep[101].est_jaccard is None
    assert rep[102].reason == "near_dup" and rep[102].matched_id == 1
    assert rep[102].est_jaccard >= 0.5
    assert 103 not in rep
    assert [r.doc_id for r in kept.collect()] == [103]


def test_state_roundtrip_parquet(spark, tmp_path):
    state = build_dedup_state(_corpus(spark))
    write_dedup_state(state, str(tmp_path / "state"))
    loaded = read_dedup_state(spark, str(tmp_path / "state"))
    kept, report = incremental_dedup(_shard(spark), loaded, threshold=0.5)
    assert sorted(r.doc_id for r in report.collect()) == [101, 102]
    assert [r.doc_id for r in kept.collect()] == [103]


def test_reingest_is_idempotent(spark):
    """After updating the state with the survivors, replaying the SAME
    shard drops everything (exact tier catches the previously-kept docs)."""
    state = build_dedup_state(_corpus(spark))
    shard = _shard(spark)
    kept, _ = incremental_dedup(shard, state, threshold=0.5)
    state2 = updated_state(state, kept)
    kept2, report2 = incremental_dedup(shard, state2, threshold=0.5)
    assert kept2.count() == 0
    rep = {r.doc_id: r.reason for r in report2.collect()}
    assert rep[103] == "exact_dup"  # now in state via the update
    assert rep[101] == "exact_dup" and rep[102] == "near_dup"


def test_decisions_deterministic_under_repartition(spark):
    state = build_dedup_state(_corpus(spark).repartition(7))
    kept_a, rep_a = incremental_dedup(
        _shard(spark).repartition(5), state, threshold=0.5
    )
    kept_b, rep_b = incremental_dedup(_shard(spark), state, threshold=0.5)
    assert sorted(r.doc_id for r in kept_a.collect()) == sorted(
        r.doc_id for r in kept_b.collect()
    )
    assert sorted((r.doc_id, r.reason) for r in rep_a.collect()) == sorted(
        (r.doc_id, r.reason) for r in rep_b.collect()
    )


def test_empty_shard_and_fresh_only_shard(spark):
    state = build_dedup_state(_corpus(spark))
    empty = spark.createDataFrame([], "doc_id long, text string")
    kept, report = incremental_dedup(empty, state)
    assert kept.count() == 0 and report.count() == 0
    fresh = spark.createDataFrame([(201, FRESH)], ["doc_id", "text"])
    kept2, report2 = incremental_dedup(fresh, state)
    assert kept2.count() == 1 and report2.count() == 0


def test_registered_summary_query(spark):
    """The rows-only registry query returns one row per outcome and the
    counts add up to the shard size."""
    from conftest import SF_SMALL

    from enterprise_data_quality_platform_spark.catalog import table
    from enterprise_data_quality_platform_spark.queries.dedup_ops import (
        dedup_incremental_shard,
    )

    rows = {r.reason: r.n_docs for r in dedup_incremental_shard(spark, SF_SMALL).collect()}
    n_shard = (
        table(spark, SF_SMALL, "documents")
        .filter(F.col("doc_id") % 7 == 3)
        .count()
    )
    assert sum(rows.values()) == n_shard
    assert rows.get("kept", 0) > 0
