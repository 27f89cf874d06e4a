"""SVG chart rendering — the reference's plot artifacts, no plot lib.

The reference draws two chart families with gonum/plot and serves
them as static SVGs under ``/graphs/``:

* **Heaps-law growth** (main.go:72-108 ``draw``): a 100-point line of
  (total tokens, distinct vocabulary) over growing doc-id prefixes,
  axis labels "Index size" / "Distinct vocabulary", a single
  rgb(10,174,194) 2pt line, legend = corpus name, 20x20 cm canvas.
* **Precision/recall** (precision_recall.go:99-216 ``Draw``): one SVG
  per valid query plus ``avg.svg``; each chart samples the strictly-
  interpolated precision function P(r) = max{p : recall > r} at 256
  points (funcFromPoints, precision_recall.go:271-284; Samples = 256),
  axes fixed to [0,1] (getPlot, :246-259), one colored 2pt line per
  weighting scheme from a palette (HappyPalette, :112), legend at the
  top, queries with < 2 P/R points skipped (:154-157).

gonum/plot is Go and no Python plotting library ships in this
container, so the SVG is emitted directly — it is a ~40-line XML
dialect and a deterministic f-string template covers everything the
reference's charts use (axes, ticks, polylines, legend).  Rendering
is driver-side over already-aggregated curve rows (hundreds of
floats), so corpus scale is irrelevant here; the heavy lifting
(curve computation) stays in Spark (operators/evaluate.py).

Determinism: same inputs -> byte-identical SVG (fixed float
formatting, no timestamps), so artifacts are content-addressable and
safely cacheable/golden-testable.
"""

from __future__ import annotations

import colorsys
import os
from typing import Iterable, Sequence

# Canvas: the reference saves 20x20 cm = 566.9 pt (vg.Centimeter =
# 28.3465 pt).  Rounded; SVG user units.
SIZE = 567
MARGIN_L, MARGIN_R, MARGIN_T, MARGIN_B = 62, 14, 46, 46
N_SAMPLES = 256  # funcFromPoints Samples (precision_recall.go:287)

#: Reference scheme order + display names (document.go:17-21) with
#: BM25 appended (our fourth scheme).
WEIGHT_NAMES = {
    "raw": "raw frequency",
    "norm": "log normalization",
    "half": "double normalization 0.5",
    "bm25": "BM25",
}

HEAPS_COLOR = "#0aaec2"  # color.RGBA{R:10, G:174, B:194} (main.go:98)


def happy_palette(n: int) -> list[str]:
    """Deterministic bright palette — stands in for
    colorful.HappyPalette (precision_recall.go:112): evenly spaced
    hues at high saturation/value."""
    out = []
    for i in range(n):
        r, g, b = colorsys.hsv_to_rgb((0.08 + i / n) % 1.0, 0.82, 0.86)
        out.append(f"#{int(r * 255):02x}{int(g * 255):02x}"
                   f"{int(b * 255):02x}")
    return out


def interp_strict(points: Sequence[tuple[float, float]],
                  n_samples: int = N_SAMPLES) -> list[tuple[float, float]]:
    """Sample the reference's interpolated precision function on the
    i/n grid: P(x) = max{precision : recall > x}, 0 if none — the
    exact funcFromPoints semantics (STRICT ``>``,
    precision_recall.go:271-284) that operators/evaluate.py
    average_curve also implements in SQL."""
    out = []
    for i in range(n_samples):
        x = i / n_samples
        p = max((y for px, y in points if px > x), default=0.0)
        out.append((x, p))
    return out


def _ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    if hi <= lo:
        hi = lo + 1.0
    return [lo + (hi - lo) * i / (n - 1) for i in range(n)]


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e7:
        return str(int(v))
    return f"{v:.2f}"


def line_chart_svg(series: Iterable[tuple[str, str,
                                          Sequence[tuple[float, float]]]],
                   x_label: str, y_label: str,
                   x_range: tuple[float, float] | None = None,
                   y_range: tuple[float, float] | None = None,
                   size: int = SIZE) -> str:
    """Generic multi-series line chart -> SVG string.

    ``series``: (legend name, css color, [(x, y), ...]) per line.
    Fixed ranges reproduce getPlot's [0,1] P/R axes; auto ranges
    (data min/max) reproduce gonum's default for the Heaps chart.
    """
    series = [s for s in list(series) if len(s[2]) >= 2]
    xs = [x for _, _, pts in series for x, _ in pts] or [0.0, 1.0]
    ys = [y for _, _, pts in series for _, y in pts] or [0.0, 1.0]
    x0, x1 = x_range if x_range else (min(xs), max(xs))
    y0, y1 = y_range if y_range else (min(ys), max(ys))
    if x1 <= x0:
        x1 = x0 + 1.0
    if y1 <= y0:
        y1 = y0 + 1.0
    iw = size - MARGIN_L - MARGIN_R
    ih = size - MARGIN_T - MARGIN_B

    def sx(x: float) -> float:
        return MARGIN_L + (x - x0) / (x1 - x0) * iw

    def sy(y: float) -> float:
        return size - MARGIN_B - (y - y0) / (y1 - y0) * ih

    e: list[str] = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" '
        f'height="{size}" viewBox="0 0 {size} {size}" '
        f'font-family="sans-serif" font-size="12">',
        f'<rect width="{size}" height="{size}" fill="white"/>',
    ]
    # axes + ticks + grid
    e.append(f'<g stroke="#333" stroke-width="1">'
             f'<line x1="{MARGIN_L}" y1="{size - MARGIN_B}" '
             f'x2="{size - MARGIN_R}" y2="{size - MARGIN_B}"/>'
             f'<line x1="{MARGIN_L}" y1="{MARGIN_T}" '
             f'x2="{MARGIN_L}" y2="{size - MARGIN_B}"/></g>')
    for tv in _ticks(x0, x1):
        px = sx(tv)
        e.append(f'<line x1="{px:.1f}" y1="{size - MARGIN_B}" '
                 f'x2="{px:.1f}" y2="{size - MARGIN_B + 5}" '
                 f'stroke="#333"/>')
        e.append(f'<line x1="{px:.1f}" y1="{MARGIN_T}" x2="{px:.1f}" '
                 f'y2="{size - MARGIN_B}" stroke="#eee"/>')
        e.append(f'<text x="{px:.1f}" y="{size - MARGIN_B + 18}" '
                 f'text-anchor="middle">{_fmt(tv)}</text>')
    for tv in _ticks(y0, y1):
        py = sy(tv)
        e.append(f'<line x1="{MARGIN_L - 5}" y1="{py:.1f}" '
                 f'x2="{MARGIN_L}" y2="{py:.1f}" stroke="#333"/>')
        e.append(f'<line x1="{MARGIN_L}" y1="{py:.1f}" '
                 f'x2="{size - MARGIN_R}" y2="{py:.1f}" stroke="#eee"/>')
        e.append(f'<text x="{MARGIN_L - 8}" y="{py + 4:.1f}" '
                 f'text-anchor="end">{_fmt(tv)}</text>')
    # axis labels
    e.append(f'<text x="{MARGIN_L + iw / 2:.1f}" y="{size - 8}" '
             f'text-anchor="middle" font-size="14">{x_label}</text>')
    e.append(f'<text x="16" y="{MARGIN_T + ih / 2:.1f}" '
             f'text-anchor="middle" font-size="14" transform='
             f'"rotate(-90 16 {MARGIN_T + ih / 2:.1f})">{y_label}</text>')
    # series lines
    for _, color, pts in series:
        coords = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in pts)
        e.append(f'<polyline points="{coords}" fill="none" '
                 f'stroke="{color}" stroke-width="2"/>')
    # legend, top (getPlot: p.Legend.Top = true)
    lx = MARGIN_L + 10
    for i, (name, color, _) in enumerate(series):
        ly = MARGIN_T + 8 + 18 * i
        e.append(f'<line x1="{lx}" y1="{ly}" x2="{lx + 26}" '
                 f'y2="{ly}" stroke="{color}" stroke-width="2"/>')
        e.append(f'<text x="{lx + 32}" y="{ly + 4}">{name}</text>')
    e.append("</svg>")
    return "\n".join(e)


def heaps_svg(points: Sequence[tuple[float, float]],
              corpus_name: str) -> str:
    """Heaps-law chart (main.go:72-108): tokens vs distinct terms
    over growing prefixes, reference axis labels and line color."""
    return line_chart_svg(
        [(corpus_name, HEAPS_COLOR, list(points))],
        x_label="Index size", y_label="Distinct vocabulary")


def pr_query_svg(curves: dict[str, Sequence[tuple[float, float]]]
                 ) -> str | None:
    """One query's P/R chart: per-scheme interpolated 256-sample
    lines.  Schemes with < 2 raw points are skipped
    (precision_recall.go:154-157); returns None when no scheme
    survives — the reference then writes no file (:167-169)."""
    schemes = [s for s in WEIGHT_NAMES if s in curves]
    colors = dict(zip(WEIGHT_NAMES, happy_palette(len(WEIGHT_NAMES))))
    series = []
    for s in schemes:
        pts = list(curves[s])
        if len(pts) < 2:
            continue
        series.append((WEIGHT_NAMES[s], colors[s], interp_strict(pts)))
    if not series:
        return None
    return line_chart_svg(series, x_label="Recall", y_label="Precision",
                          x_range=(0.0, 1.0), y_range=(0.0, 1.0))


def avg_pr_svg(avg_curves: dict[str, Sequence[tuple[float, float]]]
               ) -> str:
    """The averaged chart (``avg.svg``): each scheme's already-
    averaged (r, avg_p_interp) rows — evaluate.average_curve output —
    drawn on the fixed [0,1] axes."""
    colors = dict(zip(WEIGHT_NAMES, happy_palette(len(WEIGHT_NAMES))))
    series = [(WEIGHT_NAMES[s], colors[s], list(avg_curves[s]))
              for s in WEIGHT_NAMES if s in avg_curves
              and len(avg_curves[s]) >= 2]
    return line_chart_svg(series, x_label="Recall", y_label="Precision",
                          x_range=(0.0, 1.0), y_range=(0.0, 1.0))


def draw_precision_recall(out_dir: str,
                          per_query: dict[int, dict[str, Sequence]],
                          avg_curves: dict[str, Sequence] | None = None
                          ) -> list[str]:
    """Write the reference's artifact tree
    (``graphs/precision_recall/<qid>.svg`` + ``avg.svg``,
    precision_recall.go:100,131,197).  ``per_query``:
    {qid: {scheme: [(recall, precision) raw V1 points]}}.  Returns
    written paths."""
    dir_ = os.path.join(out_dir, "precision_recall")
    os.makedirs(dir_, exist_ok=True)
    written = []
    for qid, curves in sorted(per_query.items()):
        svg = pr_query_svg(curves)
        if svg is None:
            continue
        path = os.path.join(dir_, f"{qid}.svg")
        with open(path, "w") as f:
            f.write(svg)
        written.append(path)
    if avg_curves:
        path = os.path.join(dir_, "avg.svg")
        with open(path, "w") as f:
            f.write(avg_pr_svg(avg_curves))
        written.append(path)
    return written


def draw_heaps(out_dir: str, points: Sequence[tuple[float, float]],
               corpus_name: str) -> str:
    """Write ``graphs/<corpus>.svg`` (main.go:74)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{corpus_name}.svg")
    with open(path, "w") as f:
        f.write(heaps_svg(points, corpus_name))
    return path
