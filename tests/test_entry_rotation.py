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
    counts, failed = {}, set()
    for path in sorted(
        glob.glob(os.path.join(entry._REPO_DIR, "CORRECTNESS_r*.json"))
    ):
        for name, row in json.load(open(path)).items():
            row = row if isinstance(row, dict) else {}
            if bool(row.get("hash_match")) or row.get("err") == "no_oracle":
                counts[name] = counts.get(name, 0) + 1
                failed.discard(name)
            else:
                failed.add(name)
    return counts, failed


def test_window_prioritizes_failures_then_least_verified():
    names = list(entry.queries())
    counts, failed = _green_counts_and_failed()
    keys = [
        (
            n not in failed,
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
    counts, failed = entry._driver_verification_counts()
    assert counts == {"aaa_green": 1, "ccc_rowsonly": 1}
    assert failed == {"bbb_failed"}
    # a later green row clears the failed flag
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"bbb_failed": {"hash_match": True, "err": None}})
    )
    counts, failed = entry._driver_verification_counts()
    assert counts == {"aaa_green": 1, "ccc_rowsonly": 1, "bbb_failed": 1}
    assert failed == set()


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
    # with zero history every name has count 0, so the changed-oracle
    # verify-first tier leads, then the alphabetical fallback
    vf = [n for n in names if n in entry.VERIFY_FIRST]
    rest = [n for n in names if n not in entry.VERIFY_FIRST]
    assert names[: len(vf)] == sorted(vf)
    assert rest == sorted(rest)
