"""Static mart dashboard (the Redash-layer stand-in): rendering contract,
chart selection, determinism, panel validation."""

from __future__ import annotations

import pytest

from enterprise_data_quality_platform_spark.dashboard import (
    DEFAULT_PANELS,
    render_dashboard_html,
    write_dashboard,
)

from conftest import SF_SMALL


def test_write_dashboard_end_to_end(spark, tmp_path):
    out = tmp_path / "marts.html"
    html = write_dashboard(spark, SF_SMALL, str(out), max_rows=10)
    assert out.read_text() == html
    for name in DEFAULT_PANELS:
        assert f"<code>{name}</code>" in html
    assert "<svg" in html  # at least one panel charted
    assert "<script" not in html  # self-contained, no scripts
    # deterministic: re-render equals (same data, no timestamps)
    assert write_dashboard(spark, SF_SMALL, str(out), max_rows=10) == html


def test_unknown_panel_raises(spark, tmp_path):
    with pytest.raises(KeyError, match="no_such_mart"):
        write_dashboard(spark, SF_SMALL, str(tmp_path / "x.html"), panels=["no_such_mart"])


def test_chart_only_for_label_numeric_shapes(spark):
    rows_labeled = spark.createDataFrame(
        [("a", 3.0), ("b", 1.0)], "k string, v double"
    ).collect()
    rows_numeric_first = spark.createDataFrame(
        [(1, 2.0)], "k long, v double"
    ).collect()
    html = render_dashboard_html(
        {"labeled": rows_labeled, "numeric": rows_numeric_first, "empty": []}
    )
    # chart for the labeled panel only; empty panel renders a note
    assert html.count("<svg") == 1
    assert "(no rows)" in html
    assert "&" not in "".join(c for c in ["checked"])  # html escaping smoke


def test_negative_and_zero_values_render_safely():
    from enterprise_data_quality_platform_spark.dashboard import _bar_svg

    assert _bar_svg([]) == ""
    assert _bar_svg([("a", 0.0)]) == ""  # no positive peak -> no chart
    svg = _bar_svg([("a", -5.0), ("b", 10.0)])
    assert 'width="0.0"' in svg  # negative clamps to zero-width bar
