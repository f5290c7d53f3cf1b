"""__spark_entry__ rotation: the driver's correctness gate samples the
first ~50 entries of queries(), so ordering must put least-driver-verified
names first and keep rotating as CORRECTNESS_r*.json files accumulate."""

from __future__ import annotations

import json
import glob
import os

import __spark_entry__ as entry


def _verified_counts():
    counts = {}
    for path in sorted(glob.glob(os.path.join(entry._REPO_DIR, "CORRECTNESS_r*.json"))):
        for name in json.load(open(path)):
            counts[name] = counts.get(name, 0) + 1
    return counts


def test_window_is_least_verified_first():
    names = list(entry.queries())
    counts = _verified_counts()
    seen = [counts.get(n, 0) for n in names]
    # ordering is non-decreasing in verification count
    assert seen == sorted(seen)
    # with 3+ rounds committed, a 50-query window must be all minimum-count
    if counts:
        min_count = min(
            counts.get(n, 0) for n in names
        )
        assert all(c == min_count for c in seen[:50])


def test_queries_and_oracles_consistent():
    qs = entry.queries()
    os_ = entry.oracle_sql()
    assert set(os_) <= set(qs)
    # every oracle is a non-empty SQL string
    assert all(isinstance(sql, str) and "SELECT" in sql.upper() for sql in os_.values())


def test_rotation_survives_missing_files(monkeypatch, tmp_path):
    monkeypatch.setattr(entry, "_REPO_DIR", str(tmp_path))  # no CORRECTNESS files
    names = list(entry.queries())
    assert len(names) > 150  # full registry, alphabetical fallback
    assert names == sorted(names)
