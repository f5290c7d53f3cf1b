"""Mechanized sweep-launch gate (VERDICT r10 item 5).

The r10 close-out's human rule — launch a promotable sweep only on
1-min loadavg < 1 AND a steal-free run-up; NEITHER instrument alone
suffices (loadavg misses host-side CPU steal; a steal probe misses our
own co-tenant's scheduler load) — made mechanical:

- ``readings(window_sec)`` samples /proc/stat's ``steal`` tick column
  over the window plus the launch loadavg, and returns a dict that gets
  embedded verbatim into the artifact (PERF_MULTISCALE.json /
  BENCH_FULL.run.json), so every committed number carries the evidence
  of its launch conditions.
- ``preflight(...)`` enforces the gate for PROMOTABLE sweeps
  (tools/multiscale.py): it fails the launch unless la1 and steal are
  under their bounds, or a waiver is recorded via $LAUNCH_GATE_WAIVER
  (the waiver TEXT lands in the artifact — an override is visible, never
  silent). bench.py only RECORDS readings and never blocks: the external
  driver invokes it non-interactively and a refused run would fail the
  driver contract.

Window default is 300 s for promotable sweeps (the r10 rule's 5-min
run-up) — override with $LAUNCH_GATE_SECONDS for iteration loops.
"""

from __future__ import annotations

import os
import time


def _cpu_ticks() -> tuple[int, int]:
    """(total_ticks, steal_ticks) from the aggregate /proc/stat cpu line."""
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals), steal


def readings(window_sec: float = 5.0, samples: int = 0) -> dict:
    """Sample steal% over ``window_sec`` (one delta, or ``samples``
    sub-deltas for a max reading) + loadavg. Cheap: sleeps, no CPU."""
    la = os.getloadavg()
    t0, s0 = _cpu_ticks()
    sub: list[float] = []
    if samples > 1:
        step = window_sec / samples
        pt, ps = t0, s0
        for _ in range(samples):
            time.sleep(step)
            ct, cs = _cpu_ticks()
            dt = max(1, ct - pt)
            sub.append(round(100.0 * (cs - ps) / dt, 3))
            pt, ps = ct, cs
        t1, s1 = pt, ps
    else:
        time.sleep(window_sec)
        t1, s1 = _cpu_ticks()
    total = max(1, t1 - t0)
    return {
        "loadavg": [round(x, 2) for x in la],
        "steal_pct": round(100.0 * (s1 - s0) / total, 3),
        "steal_pct_max_subsample": max(sub) if sub else None,
        "window_sec": window_sec,
        "sampled_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }


def preflight(
    max_la1: float = 1.0,
    max_steal_pct: float = 0.5,
    window_sec: float | None = None,
    samples: int = 10,
) -> dict:
    """Gate a promotable sweep launch. Returns the readings doc with
    ``passed`` / ``waiver`` fields; raises SystemExit when the gate fails
    and no $LAUNCH_GATE_WAIVER is set."""
    if window_sec is None:
        window_sec = float(os.environ.get("LAUNCH_GATE_SECONDS", "300"))
    doc = readings(window_sec=window_sec, samples=samples)
    doc["max_la1"] = max_la1
    doc["max_steal_pct"] = max_steal_pct
    worst_steal = max(
        doc["steal_pct"], doc["steal_pct_max_subsample"] or 0.0
    )
    doc["passed"] = (
        doc["loadavg"][0] < max_la1 and worst_steal <= max_steal_pct
    )
    waiver = os.environ.get("LAUNCH_GATE_WAIVER", "")
    doc["waiver"] = waiver or None
    if not doc["passed"] and not waiver:
        raise SystemExit(
            f"launch gate FAILED: la1={doc['loadavg'][0]} (need <{max_la1}),"
            f" steal={worst_steal}% over {window_sec:.0f}s (need"
            f" <={max_steal_pct}%). Set LAUNCH_GATE_WAIVER='reason' to"
            " launch anyway (the waiver text is recorded in the artifact),"
            " or LAUNCH_GATE_SECONDS to shorten the run-up for"
            " non-promotable iteration runs."
        )
    return doc
