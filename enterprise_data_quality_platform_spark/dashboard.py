"""Static mart dashboard — the Redash layer's sandbox-shaped stand-in.

The reference fronts its BigQuery marts with Redash
(``/root/reference/README.md``: "Airflow + Great Expectations + dbt Cloud
+ BigQuery + Redash"). A dashboard SERVER is out of scope for an engine
repo; what the engine owes the stack is the QUERY-to-VISUAL step: run a
set of registered mart queries and render one self-contained HTML page —
a table per query plus an inline-SVG bar chart for (label, numeric)
shapes. Same discipline as the data-docs renderer (``checks/suite_io``):
no scripts, no external assets, deterministic for a given result set, so
the page is golden-file testable and serves from any object store.

Row budget: each query is capped at ``max_rows`` driver-side — a
dashboard is a summary surface; the full result set stays in the engine.
"""

from __future__ import annotations

import html as _html
from numbers import Number
from pathlib import Path
from typing import Mapping, Sequence

from pyspark.sql import SparkSession

#: default panel set: headline marts with dashboard-sized outputs.
DEFAULT_PANELS: tuple[str, ...] = (
    "mart_region_revenue",
    "mart_pricing_summary",
    "mart_topk_customers",
    "mart_status_priority_pivot",
    "dq_suite_report",
)


def _bar_svg(rows: Sequence[tuple[str, float]], width: int = 480) -> str:
    """Inline horizontal bars for (label, value) pairs; values ≥ 0 scale
    to the max, negatives render as zero-width (tables carry the truth)."""
    if not rows:
        return ""
    peak = max((v for _, v in rows if isinstance(v, Number) and v > 0), default=0)
    if not peak:
        return ""
    bar_h, gap = 16, 4
    height = len(rows) * (bar_h + gap)
    parts = [
        f'<svg role="img" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">'
    ]
    for i, (label, v) in enumerate(rows):
        y = i * (bar_h + gap)
        w = max(0.0, float(v)) / peak * (width - 180)
        parts.append(
            f'<text x="0" y="{y + 12}" font-size="11">{_html.escape(str(label)[:24])}</text>'
            f'<rect x="170" y="{y}" width="{w:.1f}" height="{bar_h}" fill="#4878a8"/>'
        )
    parts.append("</svg>")
    return "".join(parts)


def render_dashboard_html(
    results: Mapping[str, Sequence],
    title: str = "EDQP marts",
) -> str:
    """Render collected query results ({name: [Row, ...]}) to one page."""
    sections = []
    for name in results:
        rows = list(results[name])
        if not rows:
            sections.append(
                f"<h2><code>{_html.escape(name)}</code></h2><p>(no rows)</p>"
            )
            continue
        cols = rows[0].__fields__ if hasattr(rows[0], "__fields__") else list(rows[0].asDict())
        head = "".join(f"<th>{_html.escape(c)}</th>" for c in cols)
        body = "".join(
            "<tr>" + "".join(f"<td>{_html.escape(str(v))}</td>" for v in row) + "</tr>"
            for row in rows
        )
        # chart when the shape is (leading label, some numeric column)
        chart = ""
        numeric_cols = [
            i for i, v in enumerate(rows[0]) if isinstance(v, Number)
        ]
        if numeric_cols and not isinstance(rows[0][0], Number):
            vi = numeric_cols[0]
            chart = _bar_svg([(row[0], row[vi]) for row in rows])
        sections.append(
            f"<h2><code>{_html.escape(name)}</code></h2>{chart}"
            f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"
        )
    return f"""<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<title>{_html.escape(title)}</title>
<style>
body {{ font: 14px/1.5 system-ui, sans-serif; margin: 2rem auto; max-width: 64rem; color: #222; }}
table {{ border-collapse: collapse; margin: .5rem 0 2rem; }}
th, td {{ text-align: left; padding: 3px 10px; border-bottom: 1px solid #e5e5e5; font-variant-numeric: tabular-nums; }}
svg {{ display: block; margin: .5rem 0; }}
</style></head><body>
<h1>{_html.escape(title)}</h1>
{''.join(sections)}
</body></html>
"""


def write_dashboard(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    panels: Sequence[str] = DEFAULT_PANELS,
    max_rows: int = 25,
) -> str:
    """Run the panel queries at ``sf_dir`` and write the page; returns the
    rendered HTML. Unknown panel names raise (a dashboard silently missing
    a panel is worse than a loud config error)."""
    from .queries import query_fns

    fns = query_fns()
    missing = [p for p in panels if p not in fns]
    if missing:
        raise KeyError(f"unknown dashboard panels: {missing}")
    results = {p: fns[p](spark, sf_dir).limit(max_rows).collect() for p in panels}
    html = render_dashboard_html(results)
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    Path(out_path).write_text(html)
    return html
