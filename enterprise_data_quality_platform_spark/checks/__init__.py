from .definitions import Check, CheckResult, REPORT_SCHEMA
from .profiler import profile_table
from .runner import ValidationGateError, gate, run_suite, suite_report_df
from .suite_io import (
    Checkpoint,
    load_checkpoint,
    load_suite,
    run_checkpoint,
    save_checkpoint,
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
    "Checkpoint",
    "save_checkpoint",
    "load_checkpoint",
    "run_checkpoint",
    "render_data_docs",
    "render_data_docs_html",
    "write_data_docs",
]
