"""Crafted-input tests for the tenth-pass operators: PII scan/redaction,
cross-table reconciliation, and containment near-dup."""

from __future__ import annotations

from pyspark.sql import functions as F

from enterprise_data_quality_platform_spark.functions.text import (
    pii_flag,
    redact_pii,
)


def _texts(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")


def test_pii_flags_detect_each_kind(spark):
    df = _texts(
        spark,
        [
            "contact me at jane.doe+spam@example.co.uk today",
            "call +1 (415) 555-0199 now",
            "server at 192.168.1.100 responded",
            "ssn is 123-45-6789 ok",
            "a perfectly clean sentence",
        ],
    )
    got = df.select(
        "id",
        *[pii_flag(F.col("text"), k).alias(k) for k in ("email", "phone", "ipv4", "ssn")],
    ).collect()
    by_id = {r.id: (r.email, r.phone, r.ipv4, r.ssn) for r in got}
    assert by_id[0][0] == 1
    assert by_id[1][1] == 1
    assert by_id[2][2] == 1
    assert by_id[3][3] == 1
    assert by_id[4] == (0, 0, 0, 0)


def test_redact_pii_replaces_with_typed_placeholders(spark):
    df = _texts(
        spark,
        ["email a@b.com, ip 10.0.0.1, ssn 123-45-6789, call 415-555-0199"],
    )
    out = df.select(redact_pii(F.col("text")).alias("t")).first().t
    assert "[EMAIL]" in out and "[IPV4]" in out and "[SSN]" in out and "[PHONE]" in out
    assert "a@b.com" not in out and "10.0.0.1" not in out
    assert "123-45-6789" not in out and "415-555-0199" not in out


def test_redaction_order_protects_ssn_and_ip_from_phone_sweep(spark):
    """The SSN/IPv4 shapes also match the greedy phone pattern — redaction
    order must tag them with their OWN placeholder first."""
    df = _texts(spark, ["id 123-45-6789 and host 10.0.0.1"])
    out = df.select(redact_pii(F.col("text")).alias("t")).first().t
    assert "[SSN]" in out and "[IPV4]" in out and "[PHONE]" not in out


# ----------------------------------------------------------- reconciliation


def test_reconciliation_counts_mismatched_and_childless(spark, monkeypatch):
    import enterprise_data_quality_platform_spark.queries.dq as dq

    orders = spark.createDataFrame(
        [(1, 30.0), (2, 10.0), (3, 99.0)], "o_orderkey long, o_totalprice double"
    )
    lineitem = spark.createDataFrame(
        # order 1 foots (10+20=30); order 2 does not (5 != 10); order 3 childless
        [(1, 10.0), (1, 20.0), (2, 5.0)],
        "l_orderkey long, l_extendedprice double",
    )
    tables = {"orders": orders, "lineitem": lineitem}
    monkeypatch.setattr(dq, "table", lambda s, d, n: tables[n])
    r = dq.dq_reconciliation(spark, "unused").first()
    assert (r.n_orders, r.n_with_lines, r.n_childless, r.n_mismatched) == (3, 2, 1, 1)
    assert r.mismatch_rate == 0.5


# -------------------------------------------------------------- containment


def test_containment_catches_subset_jaccard_misses(spark):
    from enterprise_data_quality_platform_spark.dedup.jaccard import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    fragment = "alpha beta gamma delta epsilon"
    superset = fragment + " " + " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, fragment), (2, superset)], "doc_id long, text string"
    )
    cont = containment_pairs(df, threshold=0.9, n=3).collect()
    assert len(cont) == 1 and cont[0].containment == 1.0  # fragment fully inside
    jac = ngram_jaccard_pairs(df, threshold=0.5, n=3).collect()
    assert jac == []  # Jaccard blind to the same pair at any meaningful bar
