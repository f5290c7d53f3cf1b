"""Pipeline orchestration (SURVEY.md §2.5 O1-O4).

The reference's control plane is Airflow: DAGs with ``>>`` fan-in edges
(``/root/reference/airflow/dags/Glue-etl-pipeline.py:125-129`` — three
master-data builds feed Sales-Enrichment, then a validation Beta-Layer),
retry policies (``pager-workflow.py:275-276``, ``retries=0`` on the alert
task ``:320``), and gate-raise short-circuits (``:143,267``).

Here the same semantics are plain Python over one SparkSession — an engine
doesn't need a scheduler to express a dependency graph:

- ``Stage``: name + fn(ctx) -> result + upstream names + retries. Results
  land in the shared ctx dict (the XCom analogue).
- topological execution; a failed stage (after retries) marks all
  transitive downstreams skipped — Airflow's upstream_failed.
- gate stages raise ``ValidationGateError`` to stop the line; alert
  stages run with retries=0 semantics replaced by idempotent sink writes
  (``alerts.py``), so retrying never double-pages.

Independent stages are submitted concurrently via a thread pool: Spark's
scheduler interleaves their jobs (FIFO/fair), which is exactly how the
Glue DAG's three parallel master-data jobs overlap.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor, Future
from dataclasses import dataclass, field
from typing import Any, Callable

Ctx = dict[str, Any]


@dataclass
class Stage:
    name: str
    fn: Callable[[Ctx], Any]
    upstream: tuple[str, ...] = ()
    retries: int = 0
    retry_delay_s: float = 0.0


class StageFailure(RuntimeError):
    def __init__(self, stage: str, cause: Exception):
        self.stage, self.cause = stage, cause
        super().__init__(f"stage {stage!r} failed: {type(cause).__name__}: {cause}")


@dataclass
class Pipeline:
    stages: list[Stage] = field(default_factory=list)
    max_parallel: int = 4

    def add(
        self,
        name: str,
        fn: Callable[[Ctx], Any],
        upstream: tuple[str, ...] = (),
        retries: int = 0,
        retry_delay_s: float = 0.0,
    ) -> "Pipeline":
        if any(s.name == name for s in self.stages):
            raise ValueError(f"duplicate stage name: {name}")
        self.stages.append(Stage(name, fn, upstream, retries, retry_delay_s))
        return self

    def run(self, ctx: Ctx | None = None, raise_on_failure: bool = True) -> Ctx:
        """Execute respecting dependencies; returns ctx with per-stage
        results under their names plus ``__status__``: name ->
        success|failed|skipped."""
        ctx = ctx if ctx is not None else {}
        by_name = {s.name: s for s in self.stages}
        for s in self.stages:
            for up in s.upstream:
                if up not in by_name:
                    raise ValueError(f"stage {s.name!r}: unknown upstream {up!r}")
        status: dict[str, str] = {}
        errors: dict[str, Exception] = {}
        pending = dict(by_name)
        running: dict[str, Future] = {}

        def attempt(stage: Stage) -> Any:
            last: Exception | None = None
            for i in range(stage.retries + 1):
                try:
                    return stage.fn(ctx)
                except Exception as exc:  # noqa: BLE001
                    last = exc
                    if i < stage.retries and stage.retry_delay_s:
                        time.sleep(stage.retry_delay_s)
            raise last  # type: ignore[misc]

        with ThreadPoolExecutor(max_workers=self.max_parallel) as pool:
            while pending or running:
                progressed = False
                for name in list(pending):
                    stage = pending[name]
                    ups = [status.get(u) for u in stage.upstream]
                    if any(u in ("failed", "skipped") for u in ups):
                        status[name] = "skipped"
                        del pending[name]
                        progressed = True
                    elif all(u == "success" for u in ups):
                        running[name] = pool.submit(attempt, stage)
                        del pending[name]
                        progressed = True
                if not running:
                    if pending and not progressed:
                        # nothing runnable, nothing in flight, nothing newly
                        # resolved: the remaining stages wait on each other —
                        # a dependency cycle. Raise instead of busy-spinning.
                        raise ValueError(
                            "dependency cycle among stages: "
                            + ", ".join(sorted(pending))
                        )
                    continue
                done = [n for n, f in running.items() if f.done()]
                if not done:
                    time.sleep(0.01)
                    continue
                for name in done:
                    fut = running.pop(name)
                    exc = fut.exception()
                    if exc is None:
                        ctx[name] = fut.result()
                        status[name] = "success"
                    else:
                        status[name] = "failed"
                        errors[name] = exc  # type: ignore[assignment]

        ctx["__status__"] = status
        if errors and raise_on_failure:
            name, cause = next(iter(errors.items()))
            raise StageFailure(name, cause)
        return ctx
