"""Chart extraction from <figure> blocks with inline SVG + data tables.

Parity map (behaviour, not code):
  * chart records ``{name, chart_type, title, y_axis_title?, y_axis_range,
    series[]}``         ~ Chart / ChartSeries models (reference
                          models/__init__.py:130-176)
  * chart_type from structural children (polyline -> Line, rect bars ->
    Bar/Column by orientation)
                        ~ _extract_chart_type plotArea-child dispatch
                          (ooxml_drawing.py:455-482)
  * series referencing the companion data grid by A1 range strings
                        ~ SERIES x_range/y_range refs (core/charts.py:
                          201-214) — materialization left to the consumer
  * y_axis_range [min, max] from observed series values
                        ~ models/__init__.py:150-152
"""

from __future__ import annotations

import re
from typing import Optional

from exstruct_spark.kernels.a1 import make_range
from exstruct_spark.kernels.dom import Node

_NUM_RE = re.compile(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?")


def _chart_type(svg: Node) -> str:
    """Structural chart-type dispatch (reference ooxml_drawing.py:455-482
    tag->label map; Bar vs Column disambiguated by bar orientation like
    barDir)."""
    if svg.find_first("polyline", "path"):
        return "Line"
    rects = svg.find_all("rect")
    if rects:
        widths = [float(r.get("width", 0) or 0) for r in rects]
        heights = [float(r.get("height", 0) or 0) for r in rects]
        if widths and sum(heights) >= sum(widths):
            return "Column"
        return "Bar"
    if svg.find_first("circle", "ellipse"):
        return "Pie"
    return "Unknown"


def _series_values(svg: Node) -> list:
    """Per-series y values from polylines (points attr) or bar rects."""
    series = []
    for pl in svg.find_all("polyline"):
        nums = [float(x) for x in _NUM_RE.findall(pl.get("points", "") or "")]
        ys = nums[1::2]
        if ys:
            series.append(ys)
    if not series:
        rects = svg.find_all("rect")
        ys = [float(r.get("height", 0) or 0) for r in rects if r.get("height")]
        if ys:
            series.append(ys)
    return series


def extract_charts(figures, tables_by_figure: Optional[dict] = None) -> list:
    """<figure> blocks containing an <svg> -> chart records.

    ``figures`` is either a pre-collected list of figure nodes (single-pass
    discipline) or a root ``Node`` to scan.  ``tables_by_figure`` maps
    id(figure-node) -> table artifact index so a chart's series can
    reference its companion data grid by range string (the J7
    chart-series->grid join, SURVEY.md §2.3).
    """
    if isinstance(figures, Node):
        figures = figures.find_all("figure")
    charts: list = []
    for i, fig in enumerate(figures):
        svg = fig.find_first("svg")
        if svg is None:
            continue
        caption = fig.find_first("figcaption")
        title = caption.text_content() if caption is not None else ""
        values = _series_values(svg)
        all_vals = [v for ys in values for v in ys]
        chart: dict = {
            "name": f"chart{i}",
            "chart_type": _chart_type(svg),
            "title": title,
        }
        if all_vals:
            chart["y_axis_range"] = [min(all_vals), max(all_vals)]
        series_list = []
        for s_idx, ys in enumerate(values):
            series: dict = {"name": f"s{s_idx}"}
            if ys:
                # the series' grid footprint as an A1 range over its own
                # value vector (1 row of len(ys) starting at series row)
                series["y_range"] = make_range(s_idx, 0, s_idx, len(ys) - 1)
                series["n_points"] = len(ys)
            series_list.append(series)
        if series_list:
            chart["series"] = series_list
        if tables_by_figure and id(fig) in tables_by_figure:
            chart["data_table_id"] = tables_by_figure[id(fig)]
        charts.append(chart)
    return charts
