"""Eval metrics dashboard — the reference's HTML report, dependency-free.

Reference: cognee/eval_framework/metrics_dashboard.py — create_dashboard
renders per-metric score distributions and bootstrap-CI bars (plotly) plus a
per-question details table into one self-contained HTML file.  This version
renders the same three sections with inline SVG (no plotting library in the
runtime), from either the reference-style per-question list or this repo's
EVAL artifact shape ({"graph_completion": {"em": ..., "ci95": {...}}, ...}).

Driver-side by construction: the input is one row per eval question
(protocol size 24-1000) — corpus-scale work happened upstream in the
scoring DataFrames.
"""

from __future__ import annotations

import html as _html
import json


def _svg_ci_bars(ci: dict[str, tuple[float, float, float]], width: int = 640) -> str:
    """Horizontal CI bars: one row per metric, mean dot + [lower, upper]
    whisker, x scaled to [0, 1] (all protocol metrics are rates)."""
    row_h, pad_l, pad_t = 34, 150, 10
    h = pad_t * 2 + row_h * max(1, len(ci))
    span = width - pad_l - 20

    def x(v: float) -> float:
        return pad_l + max(0.0, min(1.0, v)) * span

    parts = [
        f'<svg role="img" width="{width}" height="{h}" viewBox="0 0 {width} {h}">'
    ]
    for i, (name, (mean, lo, hi)) in enumerate(sorted(ci.items())):
        cy = pad_t + row_h * i + row_h // 2
        parts.append(
            f'<text x="8" y="{cy + 4}" font-size="13">{_html.escape(name)}</text>'
        )
        parts.append(
            f'<line x1="{x(lo):.1f}" y1="{cy}" x2="{x(hi):.1f}" y2="{cy}" '
            'stroke="#888" stroke-width="4"/>'
        )
        parts.append(f'<circle cx="{x(mean):.1f}" cy="{cy}" r="6" fill="#333"/>')
        parts.append(
            f'<text x="{x(hi) + 8:.1f}" y="{cy + 4}" font-size="12">'
            f"{mean:.3f} [{lo:.3f}, {hi:.3f}]</text>"
        )
    parts.append("</svg>")
    return "".join(parts)


def _svg_histogram(scores: list[float], bins: int = 10, width: int = 320) -> str:
    """Score distribution over [0, 1] as an SVG bar chart."""
    counts = [0] * bins
    for s in scores:
        counts[min(bins - 1, int(max(0.0, min(1.0, s)) * bins))] += 1
    top = max(counts) or 1
    h, pad = 120, 16
    bw = (width - 2 * pad) / bins
    parts = [f'<svg role="img" width="{width}" height="{h}" viewBox="0 0 {width} {h}">']
    for i, c in enumerate(counts):
        bh = (h - 2 * pad) * c / top
        parts.append(
            f'<rect x="{pad + i * bw:.1f}" y="{h - pad - bh:.1f}" '
            f'width="{bw - 2:.1f}" height="{bh:.1f}" fill="#69c"/>'
        )
    parts.append("</svg>")
    return "".join(parts)


def create_dashboard(
    per_metric_scores: dict[str, list[float]] | None = None,
    ci: dict[str, tuple[float, float, float]] | None = None,
    details: list[dict] | None = None,
    eval_artifact: dict | str | None = None,
    title: str = "QA eval dashboard",
    output_file: str | None = None,
) -> str:
    """Render the dashboard HTML (and write it when ``output_file`` is set).

    Either pass the reference-style inputs (per-metric score lists + CI
    tuples + per-question detail dicts), or ``eval_artifact`` — a path or
    dict in this repo's EVAL_r{N}.json shape, whose per-search-type ``ci95``
    blocks become the CI section.
    """
    per_metric_scores = dict(per_metric_scores or {})
    ci = dict(ci or {})
    if eval_artifact is not None:
        art = (
            json.load(open(eval_artifact))
            if isinstance(eval_artifact, str)
            else eval_artifact
        )
        for st, block in art.items():
            if isinstance(block, dict) and "ci95" in block:
                for metric, (mean, lo, hi) in block["ci95"].items():
                    ci[f"{st}/{metric}"] = (mean, lo, hi)
    sections = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{_html.escape(title)}</title>",
        "<style>body{font-family:sans-serif;margin:2em}table{border-collapse:"
        "collapse}td,th{border:1px solid #ccc;padding:4px 8px;font-size:13px}"
        "</style></head><body>",
        f"<h1>{_html.escape(title)}</h1>",
    ]
    if ci:
        sections.append("<h2>Bootstrap 95% confidence intervals</h2>")
        sections.append(_svg_ci_bars(ci))
    for metric, scores in sorted(per_metric_scores.items()):
        sections.append(f"<h2>{_html.escape(metric)} distribution</h2>")
        sections.append(_svg_histogram(scores))
    if details:
        sections.append("<h2>Per-question details</h2><table><tr>")
        cols = list(details[0].keys())
        sections.append("".join(f"<th>{_html.escape(str(c))}</th>" for c in cols))
        sections.append("</tr>")
        for row in details:
            sections.append(
                "<tr>"
                + "".join(f"<td>{_html.escape(str(row.get(c, '')))}</td>" for c in cols)
                + "</tr>"
            )
        sections.append("</table>")
    sections.append("</body></html>")
    out = "".join(sections)
    if output_file:
        with open(output_file, "w") as f:
            f.write(out)
    return out
