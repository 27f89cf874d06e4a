"""SVG chart rendering (plots.py) — structure, semantics, determinism."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from rechercheinfoweb_spark import plots

PR_POINTS = [(0.2, 1.0), (0.4, 0.5), (0.6, 0.6), (1.0, 0.4)]


def _polylines(svg: str):
    root = ET.fromstring(svg)  # raises on malformed XML
    ns = "{http://www.w3.org/2000/svg}"
    return root.findall(f".//{ns}polyline")


def test_interp_strict_matches_reference_semantics():
    """P(x) = max{p : recall > x} with a STRICT comparison
    (funcFromPoints, precision_recall.go:271-284)."""
    pts = plots.interp_strict(PR_POINTS, n_samples=10)
    assert len(pts) == 10
    # at x=0.0 every point qualifies -> max precision
    assert pts[0] == (0.0, 1.0)
    # at x=0.2 the (0.2, 1.0) point is EXCLUDED (strict >)
    assert pts[2] == (0.2, 0.6)
    # past the last recall -> 0
    assert plots.interp_strict([(0.5, 0.9)], n_samples=4)[3] == (0.75, 0.0)


def test_heaps_svg_structure_and_determinism():
    curve = [(i * 1000.0, 100.0 * i ** 0.5) for i in range(1, 101)]
    svg = plots.heaps_svg(curve, "main")
    assert svg == plots.heaps_svg(curve, "main")  # byte-identical
    lines = _polylines(svg)
    assert len(lines) == 1
    assert lines[0].get("stroke") == plots.HEAPS_COLOR
    assert len(lines[0].get("points").split()) == 100
    assert "Distinct vocabulary" in svg and "Index size" in svg


def test_pr_query_svg_skips_thin_schemes():
    svg = plots.pr_query_svg({"raw": PR_POINTS,
                              "bm25": [(0.5, 0.5)]})  # < 2 pts: skipped
    lines = _polylines(svg)
    assert len(lines) == 1
    assert len(lines[0].get("points").split()) == plots.N_SAMPLES
    assert "raw frequency" in svg and "BM25" not in svg
    # no scheme survives -> None, the reference writes no file
    assert plots.pr_query_svg({"raw": [(0.5, 0.5)]}) is None


def test_draw_artifact_tree(tmp_path):
    out = str(tmp_path / "graphs")
    per_query = {1: {"raw": PR_POINTS, "bm25": PR_POINTS},
                 2: {"raw": [(0.1, 1.0)]}}  # invalid -> skipped
    avg = {"bm25": [(i / 256, 0.5) for i in range(256)]}
    written = plots.draw_precision_recall(out, per_query, avg)
    names = sorted(p.split("/")[-1] for p in written)
    assert names == ["1.svg", "avg.svg"]
    heaps = plots.draw_heaps(out, [(1.0, 1.0), (2.0, 1.5)], "main")
    assert heaps.endswith("main.svg")
    for p in written + [heaps]:
        ET.parse(p)  # well-formed on disk
