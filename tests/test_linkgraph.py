"""Link graph: extraction round-trip, degrees, PageRank math.

Ground truth for PageRank is a dense numpy power iteration with the
identical update rule — an independent implementation, not a
refactor of the operator's joins.
"""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from rechercheinfoweb_spark.operators import linkgraph as lg
from rechercheinfoweb_spark.sources.web_pages import (
    extraction_mismatches, link_targets, synthetic_web_pages,
)

N = 60


@pytest.fixture(scope="module")
def linked_pages(spark):
    return synthetic_web_pages(spark, N, with_links=True).persist()


def _url(i: int) -> str:
    return f"https://host{i % 97}.example/p/{i:08d}"


def test_extract_links_roundtrip(spark, linked_pages):
    """Extracted (src, dst) edges == the generator's link rule, and
    anchors are non-empty vocab words."""
    got = {(r["src"], r["dst"])
           for r in lg.extract_links(linked_pages).collect()}
    want = {(_url(i), _url(j))
            for i in range(N) for j in link_targets(i, N)}
    assert got == want
    assert all(r["anchor"]
               for r in lg.extract_links(linked_pages).collect())


def test_links_preserve_extraction_invariant(linked_pages):
    """The nav block never leaks into extracted text."""
    assert extraction_mismatches(linked_pages).count() == 0


def test_links_do_not_change_text(spark):
    """with_links only alters html bytes; text (→ tokens, ids, index)
    is byte-identical to the link-free corpus."""
    plain = synthetic_web_pages(spark, 30).select("url", "text")
    linked = synthetic_web_pages(spark, 30, with_links=True) \
        .select("url", "text")
    assert plain.exceptAll(linked).count() == 0
    assert linked.exceptAll(plain).count() == 0


def _numpy_pagerank(n, edges, n_iter, d):
    """Dense reference: dedup + self-loop-drop, out-deg after
    restriction, dangling spread uniformly."""
    es = {(s, t) for s, t in edges if s != t and s < n and t < n}
    out = np.zeros(n)
    for s, _t in es:
        out[s] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dang = pr[out == 0].sum()
        nxt = np.full(n, (1 - d) / n)
        nxt += d * dang / n
        for s, t in es:
            nxt[t] += d * pr[s] / out[s]
        pr = nxt
    return pr


@pytest.mark.parametrize("n_iter", [1, 7])
def test_pagerank_matches_numpy(spark, n_iter):
    """Spark PageRank == dense power iteration at 1e-12, Σpr == 1.
    Graph includes dangling nodes, a hub, duplicate and self edges
    (which must be ignored), and an isolated node."""
    n, d = 25, 0.85
    edges = ([(i, (i * 3 + 1) % n) for i in range(0, n, 2)]
             + [(i, 0) for i in range(1, n, 3)]       # hub
             + [(4, 9), (4, 9), (6, 6)])              # dup + self
    nodes = spark.createDataFrame([Row(node=i) for i in range(n)])
    e = spark.createDataFrame([Row(src=s, dst=t) for s, t in edges])
    got = dict(lg.pagerank(nodes, e, n_iter=n_iter, damping=d)
               .collect())
    want = _numpy_pagerank(n, edges, n_iter, d)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-12)


def test_pagerank_out_of_corpus_targets_redistributed(spark):
    """Edges to urls outside the node set are dropped BEFORE
    out-degrees: a page whose only link leaves the corpus is
    dangling."""
    nodes = spark.createDataFrame([Row(node="a"), Row(node="b")])
    e = spark.createDataFrame(
        [Row(src="a", dst="elsewhere"), Row(src="b", dst="a")])
    pr = dict(lg.pagerank(nodes, e, n_iter=3).collect())
    want = _numpy_pagerank(2, [(1, 0)], 3, 0.85)  # a=0, b=1
    assert pr["a"] == pytest.approx(want[0], abs=1e-12)
    assert pr["b"] == pytest.approx(want[1], abs=1e-12)
    deg = {r["node"]: r for r in lg.degree_stats(
        nodes.select("node"), e).collect()}
    assert deg["a"]["dangling"] and deg["a"]["out_deg"] == 0
    assert deg["a"]["in_deg"] == 1 and deg["b"]["out_deg"] == 1


def test_pagerank_partitioning_invariance(spark, linked_pages):
    """Same ranks (to float noise) at different parallelism — the
    iteration has no arrival-order dependence."""
    edges = lg.extract_links(linked_pages)
    nodes = linked_pages.select(F.col("url").alias("node"))
    a = dict(lg.pagerank(
        nodes.repartition(1), edges.repartition(1), n_iter=4)
        .collect())
    b = dict(lg.pagerank(
        nodes.repartition(16), edges.repartition(16), n_iter=4)
        .collect())
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_extract_links_plan_prunes_columns(spark, linked_pages):
    """The edge scan reads only (url, html) — text/lang pruned."""
    tmp = "/tmp/riw_lg_prune"
    linked_pages.write.mode("overwrite").parquet(tmp)
    plan = lg.extract_links(spark.read.parquet(tmp)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan.split("ReadSchema")[1][:200]
