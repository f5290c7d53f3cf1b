"""__spark_entry__ rotation: the driver's correctness gate samples the
first ~50 entries of queries(), so ordering must put recently-FAILED names
first (fixes re-verify next round), then least-green-verified names, and
keep rotating as CORRECTNESS_r*.json files accumulate."""

from __future__ import annotations

import json
import glob
import os

import __spark_entry__ as entry


def _green_counts_and_failed():
    import re

    counts, failed, last_hash_green = {}, set(), {}
    for path in sorted(
        glob.glob(os.path.join(entry._REPO_DIR, "CORRECTNESS_r*.json"))
    ):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        for name, row in json.load(open(path)).items():
            row = row if isinstance(row, dict) else {}
            if bool(row.get("hash_match")) or row.get("err") == "no_oracle":
                counts[name] = counts.get(name, 0) + 1
                failed.discard(name)
                if bool(row.get("hash_match")):
                    last_hash_green[name] = max(last_hash_green.get(name, 0), rnd)
            else:
                failed.add(name)
    return counts, failed, last_hash_green


def test_window_prioritizes_failures_then_least_verified():
    names = list(entry.queries())
    counts, failed, last_hash_green = _green_counts_and_failed()
    keys = [
        (
            n not in failed,
            not (
                n in entry.ORACLE_CHANGED
                and last_hash_green.get(n, 0) <= entry.ORACLE_CHANGED[n]
            ),
            not (n in entry.VERIFY_FIRST and counts.get(n, 0) == 0),
            counts.get(n, 0),
            n,
        )
        for n in names
    ]
    # the full ordering IS the sort by (not-failed, verify-first,
    # green-count, name); the first-50 window is therefore a prefix of
    # that order by construction
    assert keys == sorted(keys)
    # every recently-failed name sits at the very front — a red driver row
    # can never rotate out of the verification window before going green
    n_failed = len(failed & set(names))
    assert set(names[:n_failed]) == (failed & set(names))


def test_failed_rows_do_not_count_as_verified(monkeypatch, tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "aaa_green": {"hash_match": True, "err": None},
                "bbb_failed": {"hash_match": False, "err": None},
                "ccc_rowsonly": {"hash_match": None, "err": "no_oracle"},
            }
        )
    )
    monkeypatch.setattr(entry, "_REPO_DIR", str(tmp_path))
    counts, failed, last_hash_green = entry._driver_verification_counts()
    assert counts == {"aaa_green": 1, "ccc_rowsonly": 1}
    assert failed == {"bbb_failed"}
    # no_oracle greens carry NO hash-green round — only real hash rows do
    assert last_hash_green == {"aaa_green": 1}
    # a later green row clears the failed flag
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"bbb_failed": {"hash_match": True, "err": None}})
    )
    counts, failed, last_hash_green = entry._driver_verification_counts()
    assert counts == {"aaa_green": 1, "ccc_rowsonly": 1, "bbb_failed": 1}
    assert failed == set()
    assert last_hash_green == {"aaa_green": 1, "bbb_failed": 2}


def test_oracle_changed_names_lead_until_hash_green_after_stamp(
    monkeypatch, tmp_path
):
    """The ORACLE_CHANGED boost (VERDICT r8 top item): a query whose
    oracle text changed in round R must sort ahead of normal rotation —
    even though old no_oracle greens give it a NONZERO count that the
    VERIFY_FIRST zero-green condition can't reach — until a HASH-green
    row lands in a round strictly after R, then retire."""
    # dq_file_stats: two old rows-only greens (r1, r2) → count 2, but no
    # hash-green row yet; stamp is 2.
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "dq_file_stats": {"hash_match": None, "err": "no_oracle"},
                "aaa_other": {"hash_match": True, "err": None},
            }
        )
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"dq_file_stats": {"hash_match": None, "err": "no_oracle"}})
    )
    monkeypatch.setattr(entry, "_REPO_DIR", str(tmp_path))
    monkeypatch.setattr(entry, "ORACLE_CHANGED", {"dq_file_stats": 2})
    monkeypatch.setattr(entry, "VERIFY_FIRST", ())
    names = list(entry.queries())
    assert names[0] == "dq_file_stats"
    # a hash-green row AT the stamp round does not retire the boost (that
    # round's file may predate the new text) ...
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"dq_file_stats": {"hash_match": True, "err": None}})
    )
    assert list(entry.queries())[0] == "dq_file_stats"
    # ... but a hash-green row AFTER the stamp does.
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({"dq_file_stats": {"hash_match": True, "err": None}})
    )
    names = list(entry.queries())
    assert names[0] != "dq_file_stats"


def test_oracle_changed_names_are_registered():
    qs = entry.queries()
    osql = entry.oracle_sql()
    for n in entry.ORACLE_CHANGED:
        assert n in qs and n in osql


def test_queries_and_oracles_consistent():
    qs = entry.queries()
    os_ = entry.oracle_sql()
    assert set(os_) <= set(qs)
    # every oracle is a non-empty SQL string
    assert all(isinstance(sql, str) and "SELECT" in sql.upper() for sql in os_.values())


def test_rotation_survives_missing_files(monkeypatch, tmp_path):
    monkeypatch.setattr(entry, "_REPO_DIR", str(tmp_path))  # no CORRECTNESS files
    names = list(entry.queries())
    assert len(names) > 150  # full registry
    # with zero history every name has count 0, so the oracle-changed
    # tier leads, then verify-first, then the alphabetical fallback
    oc = [n for n in names if n in entry.ORACLE_CHANGED]
    vf = [n for n in names if n in entry.VERIFY_FIRST]
    rest = [n for n in names if n not in entry.VERIFY_FIRST and n not in oc]
    assert names[: len(oc)] == sorted(oc)
    assert names[len(oc) : len(oc) + len(vf)] == sorted(vf)
    assert rest == sorted(rest)
