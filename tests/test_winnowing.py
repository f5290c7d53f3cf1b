"""Winnowing fingerprints (MOSS local fingerprinting): the detection
guarantee, short-doc convention, determinism, and the pair join."""

from __future__ import annotations

from pyspark.sql import Row

from enterprise_data_quality_platform_spark.plans.training_data import (
    winnow_fingerprints,
    winnow_pairs,
)

K, W = 5, 4
GUARANTEE = W + K - 1  # any shared token run this long shares a fingerprint


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """Two documents sharing a run of >= w+k-1 tokens must share at least
    one fingerprint — the winnowing detection guarantee."""
    shared = " ".join(f"tok{i}" for i in range(GUARANTEE))
    docs = _docs(
        spark,
        [
            (1, f"alpha beta gamma {shared} delta epsilon zeta"),
            (2, f"one two three four five {shared} six seven"),
        ],
    )
    fps = winnow_fingerprints(docs, k=K, w=W).collect()
    by_doc = {1: set(), 2: set()}
    for r in fps:
        by_doc[r.doc_id].add(r.fp)
    assert by_doc[1] & by_doc[2]


def test_winnow_disjoint_docs_share_nothing(spark):
    docs = _docs(
        spark,
        [
            (1, " ".join(f"a{i}" for i in range(30))),
            (2, " ".join(f"b{i}" for i in range(30))),
        ],
    )
    fps = winnow_fingerprints(docs, k=K, w=W).collect()
    a = {r.fp for r in fps if r.doc_id == 1}
    b = {r.fp for r in fps if r.doc_id == 2}
    assert a and b and not (a & b)


def test_winnow_short_docs_omitted(spark):
    """Docs with fewer than k+w-1 tokens have no full window → no rows."""
    docs = _docs(
        spark,
        [
            (1, " ".join(f"t{i}" for i in range(GUARANTEE - 1))),  # too short
            (2, " ".join(f"t{i}" for i in range(GUARANTEE))),  # exactly enough
        ],
    )
    out = winnow_fingerprints(docs, k=K, w=W).collect()
    assert {r.doc_id for r in out} == {2}
    # exactly-enough doc has exactly one full window → one fingerprint
    assert len(out) == 1


def test_winnow_deterministic_and_partition_invariant(spark):
    docs = _docs(
        spark, [(i, " ".join(f"w{i}x{j}" for j in range(40))) for i in range(20)]
    )
    a = sorted((r.doc_id, r.fp) for r in winnow_fingerprints(docs).collect())
    b = sorted(
        (r.doc_id, r.fp)
        for r in winnow_fingerprints(docs.repartition(7)).collect()
    )
    assert a == b and a


def test_winnow_pairs_finds_planted_near_dup(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    docs = _docs(
        spark,
        [
            (1, base),
            (2, base + " trailing extra words here"),  # near-dup of 1
            (3, " ".join(f"other{i}" for i in range(60))),  # unrelated
        ],
    )
    pairs = winnow_pairs(docs, k=K, w=W, min_shared=2).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    assert pairs[0].shared_fps >= 2


def test_winnow_keep_one_per_cluster(spark):
    """End-to-end X12 dedup: pair graph → connected components → keep the
    min-id member per cluster; unrelated docs untouched; idempotent."""
    from enterprise_data_quality_platform_spark.dedup import (
        keep_one_per_cluster,
    )
    from enterprise_data_quality_platform_spark.plans.training_data import (
        winnow_pairs,
    )

    base = " ".join(f"tok{i}" for i in range(60))
    other = " ".join(f"other{i}" for i in range(60))
    docs = _docs(
        spark,
        [
            (1, base),
            (2, base + " tail a"),
            (3, base + " tail b"),  # cluster {1,2,3} → keep 1
            (7, other),  # untouched
        ],
    )
    pairs = winnow_pairs(docs, k=K, w=W, min_shared=2)
    kept = keep_one_per_cluster(docs, pairs)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 7]
    again = keep_one_per_cluster(kept, winnow_pairs(kept, k=K, w=W, min_shared=2))
    assert sorted(r.doc_id for r in again.collect()) == [1, 7]


def test_winnow_pairs_hot_fingerprint_guard(spark):
    """A fingerprint shared by more docs than max_bucket is dropped — the
    boilerplate/template skew guard."""
    boiler = " ".join(f"tpl{i}" for i in range(GUARANTEE))
    docs = _docs(
        spark,
        [(i, f"{boiler} unique{i}a unique{i}b unique{i}c") for i in range(6)],
    )
    # every doc shares the template fingerprints: with the guard at 5,
    # template fps (in all 6 docs) drop; nothing else is shared
    guarded = winnow_pairs(docs, k=K, w=W, min_shared=1, max_bucket=5).collect()
    assert guarded == []
    unguarded = winnow_pairs(
        docs, k=K, w=W, min_shared=1, max_bucket=None
    ).collect()
    assert len(unguarded) == 15  # all C(6,2) pairs share the template
