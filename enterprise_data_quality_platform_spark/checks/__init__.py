from .definitions import Check, CheckResult, REPORT_SCHEMA
from .profiler import profile_table
from .runner import ValidationGateError, gate, run_suite, suite_report_df
from .suite_io import (
    load_suite,
    render_data_docs,
    render_data_docs_html,
    save_suite,
    write_data_docs,
)

__all__ = [
    "Check",
    "CheckResult",
    "REPORT_SCHEMA",
    "run_suite",
    "gate",
    "ValidationGateError",
    "suite_report_df",
    "profile_table",
    "load_suite",
    "save_suite",
    "render_data_docs",
    "render_data_docs_html",
    "write_data_docs",
]
