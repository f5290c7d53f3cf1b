"""R19 — the UDF escape hatch (SURVEY.md §2.3 R19).

All of the reference's validators are Python functions today
(``/root/reference/analysis.md:9``); this engine compiles them to JVM
expressions instead (the fast path). When custom logic genuinely can't be
expressed with built-ins, the sanctioned path is an Arrow-batched
``pandas_udf`` — 10-100× faster than row-at-a-time Python UDFs — and the
test suite asserts the vectorized twin matches the JVM implementation
exactly, so the escape hatch can be trusted as a drop-in.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import STOPWORDS


@F.pandas_udf(T.DoubleType())
def quality_score_pandas(text: pd.Series) -> pd.Series:
    """Vectorized twin of functions.text.quality_score (same formula,
    pandas string ops on Arrow batches)."""
    import numpy as np

    stripped = text.str.strip()
    n_tokens = stripped.str.split(r"\s+").map(len).where(stripped.str.len() > 0, 0)
    n_chars = text.str.len().clip(lower=1)
    punct = text.str.count(r"[.,!?;:]") / n_chars
    toks = stripped.str.lower().str.split(r"\s+")
    stop_hits = toks.map(lambda ts: sum(1 for t in ts if t in set(STOPWORDS)))
    stop_ratio = stop_hits / toks.map(len).clip(lower=1)
    score = np.minimum(1.0, n_tokens / 200.0) * (1 - punct) * (1 - stop_ratio)
    return np.floor(score * 10000 + 0.5) / 10000  # fx_round twin


def custom_check_udf(fn, return_type: str = "boolean"):
    """Wrap a per-batch pandas function as a check predicate column.
    ``fn: pd.Series -> pd.Series[bool]`` — True = row passes."""
    return F.pandas_udf(fn, return_type)
