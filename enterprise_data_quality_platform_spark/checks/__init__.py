from .definitions import Check, CheckResult, REPORT_SCHEMA
from .runner import run_suite, gate, suite_report_df

__all__ = [
    "Check",
    "CheckResult",
    "REPORT_SCHEMA",
    "run_suite",
    "gate",
    "suite_report_df",
]
