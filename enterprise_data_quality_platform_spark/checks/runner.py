"""Check-suite runner: whole-suite scan fusion, per-check fault isolation,
gate.

Semantics reproduced from the reference:
- per-check try/except isolation — one failing check never kills the suite
  (``/root/reference/airflow/dags/pager-workflow.py:158-233``, and
  ``run_all_validations`` in ``/root/reference/analysis.md:9``);
- pass/fail summary aggregation (``pager-workflow.py:236-245``);
- threshold gate that raises after alerts are written
  (``pager-workflow.py:139-143,247-267``).

Execution differs deliberately. The reference runs one BigQuery round-trip
per check (5 queries over 2 tables for 5 checks); at 100TB each round-trip
is a full scan. Here the WHOLE suite compiles into ONE Spark job:

    (table-A fused aggs) × (table-B fused aggs) × ... × (RI anti-join aggs)

— a crossJoin chain of single-row aggregate frames. Each factor is an
independent stage, so the DAG scheduler runs all table scans concurrently
inside the one job, and N checks over M tables cost M scans and one
driver round-trip. If the fused job fails (e.g. one malformed expression),
the runner falls back to per-check execution so isolation is preserved.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime, timezone
from functools import reduce
from typing import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from .compiler import (
    SAMPLE_CAP,
    SAMPLEABLE_TYPES,
    CompiledAggCheck,
    compile_agg_check,
    evaluate_ri,
    ri_frame,
    run_plan_check,
    violation_sample_df,
    _result,
)
from .definitions import AGG_CHECK_TYPES, Check, CheckResult, REPORT_SCHEMA


def _error_result(check: Check, exc: Exception) -> CheckResult:
    return _result(check, "error", None, None, {}, error=f"{type(exc).__name__}: {exc}")


def _attach_samples(
    tables: Mapping[str, DataFrame],
    checks: Sequence[Check],
    results: dict[int, CheckResult],
) -> None:
    """Enrich FAILED row-condition checks with a capped violating-value
    sample via a separate limit-k query per failure. Failures are the rare
    path, so this costs nothing when the suite is green, and the fused scan
    never carries unbounded collect_set state."""
    for i, r in results.items():
        check = checks[i]
        if (
            r.status != "fail"
            or check.check_type not in SAMPLEABLE_TYPES
            or check.column is None
            or check.table not in tables
        ):
            continue
        try:
            vals = [
                row[0]
                for row in violation_sample_df(
                    tables[check.table], check, SAMPLE_CAP
                ).collect()
            ]
            if vals:
                r.observed["sample"] = str(sorted(vals))
        except Exception:  # noqa: BLE001 — sample is best-effort decoration
            pass


def _collect_fused(fused: DataFrame) -> dict:
    """Collect the fused 1-row frame with AQE disabled for this one job.

    The fused plan is a crossJoin chain of independent 1-row aggregate
    factors. AQE materializes each shuffle query stage in waves, which
    serializes the factor subtrees; with AQE off the whole DAG is submitted
    at once and every factor's stages schedule concurrently (measured at
    sf10: 3.2 s → 2.0 s for the 8-check suite). AQE's own wins don't apply
    here — every factor ends in a single row, join sides are explicit
    broadcasts, and there is no skew to re-plan — so this is strictly the
    better trade for the fused job. Runtime conf, restored immediately;
    the per-check fallback path keeps AQE."""
    spark = fused.sparkSession
    key = "spark.sql.adaptive.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        return fused.collect()[0].asDict()
    finally:
        spark.conf.set(key, old)


def run_suite(
    tables: Mapping[str, DataFrame],
    checks: Sequence[Check],
    fuse: bool = True,
    sample_violations: bool = True,
) -> list[CheckResult]:
    """Run all checks; never raises for an individual check's failure."""
    results: dict[int, CheckResult] = {}
    agg_groups: dict[str, list[tuple[int, CompiledAggCheck]]] = defaultdict(list)
    ri_checks: list[tuple[int, Check, DataFrame]] = []

    for i, check in enumerate(checks):
        try:
            if check.check_type in AGG_CHECK_TYPES:
                compiled = compile_agg_check(check, prefix=f"c{i}")
                if check.table not in tables:
                    raise KeyError(f"table not loaded: {check.table}")
                agg_groups[check.table].append((i, compiled))
            elif check.check_type == "referential_integrity":
                ri_checks.append((i, check, ri_frame(check, tables, prefix=f"c{i}")))
            else:
                results[i] = run_plan_check(check, tables)
        except Exception as exc:  # noqa: BLE001 — isolation is the contract
            results[i] = _error_result(check, exc)

    factors: list[DataFrame] = []
    loose: list[tuple[int, CompiledAggCheck]] = []  # groups that failed analysis
    for table_name, group in agg_groups.items():
        # distinct-shaped checks carry their own groupBy factor (see
        # CompiledAggCheck.frame_builder) — they join the same fused job as
        # independent concurrent stages instead of Expand-ing the shared scan
        for i, compiled in group:
            if compiled.frame_builder is None:
                continue
            try:
                factors.append(compiled.frame_builder(tables[table_name]))
            except Exception as exc:  # noqa: BLE001
                results[i] = _error_result(compiled.check, exc)
                loose.append((i, compiled))
        expr_group = [(i, c) for i, c in group if c.frame_builder is None]
        exprs = [
            col.alias(alias)
            for _, compiled in expr_group
            for alias, col in compiled.exprs.items()
        ]
        if not exprs:
            continue
        try:
            factors.append(tables[table_name].agg(*exprs))
        except Exception:
            # one bad expression fails the whole group's analysis — retry
            # each check alone so the good ones still run (isolation)
            for i, compiled in expr_group:
                try:
                    factors.append(
                        tables[table_name].agg(
                            *[c.alias(a) for a, c in compiled.exprs.items()]
                        )
                    )
                except Exception as exc:  # noqa: BLE001
                    results[i] = _error_result(compiled.check, exc)
                    loose.append((i, compiled))
    factors.extend(frame for _, _, frame in ri_checks)

    def finish() -> list[CheckResult]:
        if sample_violations:
            _attach_samples(tables, checks, results)
        return [results[i] for i in sorted(results)]

    if not factors:
        return finish()

    if fuse:
        try:
            row = _collect_fused(reduce(DataFrame.crossJoin, factors))
            dead = {i for i, _ in loose}
            for group in agg_groups.values():
                for i, compiled in group:
                    if i in dead:
                        continue  # already reported as error
                    try:
                        results[i] = compiled.evaluate(row, compiled.prefix)
                    except Exception as exc:  # noqa: BLE001
                        results[i] = _error_result(compiled.check, exc)
            for i, check, _ in ri_checks:
                try:
                    results[i] = evaluate_ri(check, row, prefix=f"c{i}")
                except Exception as exc:  # noqa: BLE001
                    results[i] = _error_result(check, exc)
            return finish()
        except Exception:
            pass  # fused job failed — fall through to isolated execution

    for table_name, group in agg_groups.items():
        df = tables[table_name]
        for i, compiled in group:
            try:
                if compiled.frame_builder is not None:
                    row = compiled.frame_builder(df).collect()[0].asDict()
                else:
                    exprs = [col.alias(a) for a, col in compiled.exprs.items()]
                    row = df.agg(*exprs).collect()[0].asDict()
                results[i] = compiled.evaluate(row, compiled.prefix)
            except Exception as exc:  # noqa: BLE001
                results[i] = _error_result(compiled.check, exc)
    for i, check, frame in ri_checks:
        try:
            row = frame.collect()[0].asDict()
            results[i] = evaluate_ri(check, row, prefix=f"c{i}")
        except Exception as exc:  # noqa: BLE001
            results[i] = _error_result(check, exc)
    return finish()


def suite_report_df(spark: SparkSession, results: Iterable[CheckResult]) -> DataFrame:
    """Materialize results as the canonical report table (SURVEY.md §1.4)."""
    rows = [
        (
            r.check_name,
            r.table,
            r.column,
            r.status,
            r.violations,
            r.total,
            r.observed,
            r.error_message,
            r.run_ts,
        )
        for r in results
    ]
    return spark.createDataFrame(rows, REPORT_SCHEMA)


def summarize(results: Sequence[CheckResult]) -> dict:
    """Pass/fail rollup mirroring pager-workflow.py:236-245."""
    passed = sum(1 for r in results if r.status == "pass")
    failed = [r.check_name for r in results if r.status != "pass"]
    return {
        "total": len(results),
        "passed": passed,
        "failed": len(failed),
        "failed_checks": failed,
        "pass_rate": round(passed / len(results), 4) if results else 1.0,
        "overall_status": "pass" if not failed else "fail",
        "run_ts": datetime.now(timezone.utc).isoformat(),
    }


class ValidationGateError(RuntimeError):
    """Raised by the gate on a failed suite — downstream stages don't run
    (pager-workflow.py:143,267 semantics)."""

    def __init__(self, summary: dict):
        self.summary = summary
        super().__init__(
            f"validation gate failed: {summary['failed']}/{summary['total']} checks "
            f"failed: {', '.join(summary['failed_checks'])}"
        )


def gate(results: Sequence[CheckResult], raise_on_fail: bool = True) -> dict:
    """Evaluate the suite gate. Alert writing happens BEFORE the raise in
    pipelines (see ``alerts.py``), matching the reference's order
    (pager-workflow.py:247-267: alert fan-out, then ``raise ValueError``)."""
    summary = summarize(results)
    if raise_on_fail and summary["overall_status"] != "pass":
        raise ValidationGateError(summary)
    return summary
