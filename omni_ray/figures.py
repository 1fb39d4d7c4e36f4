"""Plotly-shaped figure JSON + dashboard HTML (reference:
src/web/dashboard.py:755-1004 — `_get_category_analytics` /
`_get_sentiment_analytics` / `_get_domain_analytics` build plotly figures
and return ``{'chart': fig_json, 'data': {...}}``).

Rebuilt as PURE dict builders: a plotly figure's JSON form is
``{"data": [trace, ...], "layout": {...}}`` — no plotly dependency needed
to produce it (the sandbox has none), and the browser side renders it with
plotly.js exactly as the reference's Flask templates do. Every builder
mirrors the reference's trace/layout fields (dual axis, stacked area,
bubble sizing) and its empty-data fallback (annotation-only layout,
dashboard.py:781-792).

This is a display layer over ALREADY-AGGREGATED query results (bounded
tables); the 100-TB data never flows through it.
"""

from __future__ import annotations

import json


def _layout(title: str, xaxis: str | None = None, yaxis: str | None = None,
            **extra) -> dict:
    lay: dict = {"title": {"text": title}}
    if xaxis:
        lay["xaxis"] = {"title": {"text": xaxis}}
    if yaxis:
        lay["yaxis"] = {"title": {"text": yaxis}}
    lay.update(extra)
    return lay


def empty_figure(title: str, text: str) -> dict:
    """The reference's no-data fallback (dashboard.py:781-792): an empty
    figure whose layout carries a centered annotation."""
    return {
        "data": [],
        "layout": _layout(
            title,
            annotations=[{
                "text": text, "xref": "paper", "yref": "paper",
                "showarrow": False, "font": {"size": 16},
            }],
        ),
    }


def category_figure(categories: list[str], counts: list[int],
                    avg_qualities: list[float]) -> dict:
    """Dual-axis bar + line (dashboard.py:793-810): counts on y, average
    quality on an overlaid right axis."""
    if not categories:
        return {
            "chart": empty_figure("No Category Data Available",
                                  "No articles found in database"),
            "data": {"categories": [], "counts": [], "avg_qualities": []},
        }
    return {
        "chart": {
            "data": [
                {"type": "bar", "name": "Article Count",
                 "x": categories, "y": counts, "yaxis": "y"},
                {"type": "scatter", "name": "Avg Quality",
                 "x": categories, "y": avg_qualities, "yaxis": "y2",
                 "mode": "lines+markers", "line": {"color": "red"}},
            ],
            "layout": _layout(
                "Article Distribution by Category", "Category",
                "Article Count",
                yaxis2={"title": {"text": "Average Quality Score"},
                        "overlaying": "y", "side": "right"},
                hovermode="x unified",
            ),
        },
        "data": {"categories": categories, "counts": counts,
                 "avg_qualities": avg_qualities},
    }


_SERIES_COLORS = {
    "positive": ("green", "rgba(0,255,0,0.3)"),
    "neutral": ("blue", "rgba(0,0,255,0.3)"),
    "negative": ("red", "rgba(255,0,0,0.3)"),
}
_FALLBACK_COLORS = [
    ("green", "rgba(0,255,0,0.3)"), ("blue", "rgba(0,0,255,0.3)"),
    ("red", "rgba(255,0,0,0.3)"), ("orange", "rgba(255,165,0,0.3)"),
    ("purple", "rgba(128,0,128,0.3)"),
]


def timeseries_figure(dates: list[str], series: dict[str, list[int]],
                      title: str = "Sentiment Analysis Over Time (Last 7 Days)",
                      ytitle: str = "Number of Articles") -> dict:
    """Stacked-area time series (dashboard.py:877-891): one scatter trace
    per series, all in stackgroup 'one'. Series named positive/neutral/
    negative keep the reference's colors; extra series rotate a fallback
    palette (our events domain has five types)."""
    if not dates:
        return {
            "chart": empty_figure(title, "Sentiment analysis data not available"),
            "data": {"dates": []},
        }
    traces = []
    for i, (name, ys) in enumerate(series.items()):
        line, fill = _SERIES_COLORS.get(
            name, _FALLBACK_COLORS[i % len(_FALLBACK_COLORS)])
        traces.append({
            "type": "scatter", "name": name.capitalize(),
            "x": dates, "y": ys, "stackgroup": "one",
            "line": {"color": line}, "fillcolor": fill,
        })
    return {
        "chart": {
            "data": traces,
            "layout": _layout(title, "Date", ytitle, hovermode="x unified"),
        },
        "data": {"dates": dates, **{k: v for k, v in series.items()}},
    }


def domain_figure(domains: list[str], article_counts: list[int],
                  avg_qualities: list[float],
                  positivity_rates: list[float]) -> dict:
    """Bubble scatter (dashboard.py:962-987): marker area ∝ article count,
    color = positivity rate on the Viridis scale, hover text per domain."""
    if not domains:
        return {
            "chart": empty_figure("No Domain Data Available",
                                  "No domain data available"),
            "data": {"domains": []},
        }
    sizeref = 2.0 * max(article_counts) / (40.0 ** 2) if article_counts else 1
    return {
        "chart": {
            "data": [{
                "type": "scatter", "x": domains, "y": avg_qualities,
                "mode": "markers",
                "marker": {
                    "size": article_counts, "sizemode": "area",
                    "sizeref": sizeref, "sizemin": 4,
                    "color": positivity_rates, "colorscale": "Viridis",
                    "showscale": True,
                    "colorbar": {"title": {"text": "Positivity %"}},
                },
                "text": [
                    f"Articles: {c}<br>Avg Quality: {q}<br>Positivity: {p}%"
                    for c, q, p in zip(article_counts, avg_qualities,
                                       positivity_rates)
                ],
                "hovertemplate": "<b>%{x}</b><br>%{text}<extra></extra>",
            }],
            "layout": _layout("Domain Performance Analysis", "Domain",
                              "Average Quality Score", hovermode="closest"),
        },
        "data": {"domains": domains, "article_counts": article_counts,
                 "avg_qualities": avg_qualities,
                 "positivity_rates": positivity_rates},
    }


def dashboard_html(figures: dict[str, dict], title: str = "omni-ray analytics") -> str:
    """Self-contained analytics page: one div per figure, rendered by
    plotly.js (CDN script tag, as the reference's templates do —
    dashboard.py renders through templates/analytics.html). The figure
    JSON is inlined, so the page needs no further API round-trips."""
    divs, scripts = [], []
    for name, fig in figures.items():
        chart = fig.get("chart", fig)
        divs.append(f'<div id="fig-{name}" class="chart"></div>')
        scripts.append(
            f"Plotly.newPlot('fig-{name}', "
            f"{json.dumps(chart.get('data', []))}, "
            f"{json.dumps(chart.get('layout', {}))});")
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>"
        '<script src="https://cdn.plot.ly/plotly-2.35.2.min.js"></script>'
        "<style>.chart{width:90%;height:420px;margin:12px auto;}</style>"
        "</head><body>"
        f"<h1>{title}</h1>"
        + "".join(divs)
        + "<script>" + "\n".join(scripts) + "</script>"
        "</body></html>"
    )
