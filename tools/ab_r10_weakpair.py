"""Round-10 by-name adjudication A/Bs for the two weak entries VERDICT r9
could not trace to a family floor (item 4):

- mart_customer_rfm: NOT a window query (it already uses broadcast
  percentile boundaries, no global ntile) — so the window-shuffle family
  cite would be wrong. Its plan feeds per_cust into TWO consumers (the
  1-row bounds aggregate and the scored pass); the one open structural
  question is whether the orders groupBy exchange is reused across them
  (ReusedExchange) or the fact aggregates twice. A/B: current vs
  localCheckpoint(per_cust) (forces single computation; at 100 TB the
  checkpoint is ~1 row per customer — cheap to materialize).

- events_user_transitions: plan-reads as the events_scd2_checksum shape
  (ONE shuffle of all events by user_id + a lead window + a tiny
  exchange-free groupBy). Decomposition: time the window pass alone
  (seq.count()) vs the full query — if the window pass is ~all the cost,
  the scd2 family floor applies by the same mechanism and the residual
  is DuckDB's in-process window.

Usage: python tools/ab_r10_weakpair.py <sf_dir> [runs]
Quiet-box protocol: warm run, then median of N (default 3), alternating
variants, per-variant loadavg stamps. Prints one JSON doc.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def build_rfm_checkpoint(spark, sf_dir):
    """mart_customer_rfm with per_cust localCheckpoint'ed (variant B)."""
    from enterprise_data_quality_platform_spark.catalog import table
    from enterprise_data_quality_platform_spark.functions.numeric import (
        fx_from_units,
        fx_round,
        fx_units,
    )

    orders = table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(F.max(F.to_date("o_orderdate")), F.lit("1970-01-01"))
        .cast("long")
        .alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(fx_units(F.col("o_totalprice"))).alias("monetary_units"),
    ).localCheckpoint(eager=True)
    bounds = per_cust.agg(
        *[
            fx_round(F.expr(f"percentile({m}, {q})"), 6).alias(f"{a}{i}")
            for m, a in (
                ("recency_days", "r"),
                ("frequency", "f"),
                ("monetary_units", "m"),
            )
            for i, q in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )

    def score(metric, a):
        s = F.lit(1)
        for i in (1, 2, 3):
            s = s + (F.col(metric) > F.col(f"{a}{i}")).cast("int")
        return s.cast("string")

    scored = per_cust.crossJoin(F.broadcast(bounds)).select(
        F.concat(
            score("recency_days", "r"),
            score("frequency", "f"),
            score("monetary_units", "m"),
        ).alias("rfm_segment"),
        "monetary_units",
    )
    return (
        scored.groupBy("rfm_segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            fx_from_units(F.sum("monetary_units")).alias("total_revenue"),
        )
        .orderBy("rfm_segment")
    )


def build_transitions_window_only(spark, sf_dir):
    """events_user_transitions' window pass alone (decomposition probe)."""
    from pyspark.sql import Window

    from enterprise_data_quality_platform_spark.catalog import table

    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())


def median_of(run, runs):
    la = round(os.getloadavg()[0], 2)
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        run()
        samples.append(round(time.perf_counter() - t0, 4))
    return round(statistics.median(samples), 4), samples, la


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from enterprise_data_quality_platform_spark.queries import query_fns
    from enterprise_data_quality_platform_spark.session import get_spark

    spark = get_spark("edqp-ab-r10")
    fns = query_fns()
    out: dict = {"sf_dir": sf_dir, "runs": runs,
                 "launch_loadavg": [round(x, 2) for x in os.getloadavg()]}

    # ---- rfm: value parity first, then plan fact, then timing
    cur = lambda: fns["mart_customer_rfm"](spark, sf_dir).collect()  # noqa: E731
    ckp = lambda: build_rfm_checkpoint(spark, sf_dir).collect()  # noqa: E731
    rows_a = fns["mart_customer_rfm"](spark, sf_dir).collect()
    rows_b = build_rfm_checkpoint(spark, sf_dir).collect()
    assert [tuple(r) for r in rows_a] == [tuple(r) for r in rows_b], "rfm variant mismatch"
    plan = fns["mart_customer_rfm"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    out["rfm_plan_reused_exchange"] = "ReusedExchange" in plan
    cur(); ckp()  # warm both
    m_cur, s_cur, la_cur = median_of(cur, runs)
    m_ckp, s_ckp, la_ckp = median_of(ckp, runs)
    # second alternation to catch session drift
    m_cur2, s_cur2, _ = median_of(cur, runs)
    out["rfm"] = {
        "current": m_cur, "current_samples": s_cur + s_cur2,
        "current_repeat": m_cur2,
        "localCheckpoint": m_ckp, "ckp_samples": s_ckp,
        "loadavg": [la_cur, la_ckp],
    }

    # ---- transitions: decomposition
    full = lambda: fns["events_user_transitions"](spark, sf_dir).collect()  # noqa: E731
    wonly_df = build_transitions_window_only(spark, sf_dir)
    wonly = lambda: wonly_df.count()  # noqa: E731
    full(); wonly()  # warm
    m_full, s_full, la_full = median_of(full, runs)
    m_w, s_w, la_w = median_of(wonly, runs)
    out["transitions"] = {
        "full": m_full, "full_samples": s_full,
        "window_pass_only": m_w, "window_samples": s_w,
        "window_share": round(m_w / m_full, 3),
        "loadavg": [la_full, la_w],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
