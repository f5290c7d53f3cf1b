"""Check-suite runner: fused scans, per-check fault isolation, gate.

Semantics reproduced from the reference:
- per-check try/except isolation — one failing check never kills the suite
  (``/root/reference/airflow/dags/pager-workflow.py:158-233``, and
  ``run_all_validations`` in ``/root/reference/analysis.md:9``);
- pass/fail summary aggregation (``pager-workflow.py:236-245``);
- threshold gate that raises after alerts are written
  (``pager-workflow.py:139-143,247-267``).

Execution differs deliberately: instead of one BigQuery round-trip per check,
all aggregate-shaped checks on a table share ONE scan (see ``compiler.py``).
If the fused job itself fails (e.g. one malformed expression), the runner
falls back to per-check execution so isolation semantics are preserved.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime, timezone
from typing import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from .compiler import CompiledAggCheck, compile_agg_check, run_plan_check, _result
from .definitions import AGG_CHECK_TYPES, Check, CheckResult, REPORT_SCHEMA


def _error_result(check: Check, exc: Exception) -> CheckResult:
    return _result(check, "error", None, None, {}, error=f"{type(exc).__name__}: {exc}")


def run_suite(
    tables: Mapping[str, DataFrame],
    checks: Sequence[Check],
    fuse: bool = True,
) -> list[CheckResult]:
    """Run all checks; never raises for an individual check's failure."""
    results: dict[int, CheckResult] = {}
    agg_groups: dict[str, list[tuple[int, CompiledAggCheck]]] = defaultdict(list)

    for i, check in enumerate(checks):
        try:
            if check.check_type in AGG_CHECK_TYPES:
                compiled = compile_agg_check(check, prefix=f"c{i}")
                agg_groups[check.table].append((i, compiled))
            else:
                results[i] = run_plan_check(check, tables)
        except Exception as exc:  # noqa: BLE001 — isolation is the contract
            results[i] = _error_result(check, exc)

    for table_name, group in agg_groups.items():
        results.update(_run_agg_group(tables, table_name, group, fuse))

    return [results[i] for i in sorted(results)]


def _run_agg_group(
    tables: Mapping[str, DataFrame],
    table_name: str,
    group: list[tuple[int, CompiledAggCheck]],
    fuse: bool,
) -> dict[int, CheckResult]:
    out: dict[int, CheckResult] = {}
    df = tables.get(table_name)
    if df is None:
        exc = KeyError(f"table not loaded: {table_name}")
        return {i: _error_result(c.check, exc) for i, c in group}

    if fuse:
        try:
            exprs = [
                col.alias(alias)
                for _, compiled in group
                for alias, col in compiled.exprs.items()
            ]
            row = df.agg(*exprs).collect()[0].asDict()
            for i, compiled in group:
                try:
                    out[i] = compiled.evaluate(row, compiled.prefix)
                except Exception as exc:  # noqa: BLE001
                    out[i] = _error_result(compiled.check, exc)
            return out
        except Exception:
            pass  # fused job failed — fall through to isolated execution

    for i, compiled in group:
        try:
            exprs = [col.alias(alias) for alias, col in compiled.exprs.items()]
            row = df.agg(*exprs).collect()[0].asDict()
            out[i] = compiled.evaluate(row, compiled.prefix)
        except Exception as exc:  # noqa: BLE001
            out[i] = _error_result(compiled.check, exc)
    return out


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
