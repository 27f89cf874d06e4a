"""Web link graph: anchor extraction, degrees, PageRank.

Beyond-reference scope (the reference indexes CACM/CS276 text records
and has no link analysis — serge.go's corpus interface carries no
edges): link structure is the other half of a Common-Crawl-style
corpus, and link-based centrality is a standard training-data quality
signal (curation pipelines weight or gate pages by host/page rank).
This module turns the ``html`` column of the web_pages table into an
edge table and computes damped PageRank (Brin & Page 1998) with exact
dangling-mass handling, as pure DataFrame ops.

Scale shape at 10^12 pages:

* ``extract_links`` is one map-side projection (regexp over the html
  column inside whole-stage codegen) — no shuffle, no Python.
* ``pagerank`` pre-restricts edges to in-corpus targets and persists
  them PARTITIONED BY src once; each iteration is then
  (1) a src-co-partitioned join rank⋈edges (one shuffle of the rank
  table — O(nodes), far smaller than edges),
  (2) a partial-agg contribution shuffle on dst (AQE skew-split
  handles mega-hub targets), and
  (3) a left join back to the node table.
  The only driver-side value per iteration is the scalar dangling
  mass (one sum over the rank rows of out-degree-0 nodes); rank
  vectors never reach the driver.
* Lineage is truncated with ``localCheckpoint`` every round — the
  same iterative-on-Spark lesson as ``dedup.dedup_clusters``: persist
  caches data but not the plan, and an unbroken K-round plan
  re-analyzes O(K) copies of the loop body per action.  On a real
  cluster swap for ``checkpoint()`` with a checkpoint dir for fault
  tolerance at the same plan-size cost.

Semantics (pinned by the DuckDB oracle ``lg_pagerank`` and the numpy
ground-truth test):

* edges are deduplicated (src, dst) pairs with self-loops dropped —
  a page linking twice to the same target counts once;
* out-degrees are computed AFTER restricting targets to the node set
  ("strongly preferential" handling: mass routed to out-of-corpus
  urls is redistributed over the survivors, conserving sum(pr) = 1);
* dangling nodes (out-degree 0) spread their mass uniformly:
  pr'(v) = (1-d)/N + d * (Σ_{u→v} pr(u)/outdeg(u) + dangling/N).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: href + anchor-text of minimal anchor tags.  Real-web HTML would
#: swap a proper parser (selectolax — not in this container) behind
#: the same (src, dst, anchor) contract; the regex IS sufficient for
#: the synthetic corpus, whose markup this repo also generates.
ANCHOR_RE = '<a href="([^"]+)">([^<]*)</a>'


def extract_links(pages: DataFrame) -> DataFrame:
    """(src, dst, anchor) edge table from the ``html`` column.

    One map-side projection: regexp_extract_all over the raw bytes
    (cast to string), exploded, then per-element group extraction —
    all JVM built-ins inside whole-stage codegen.  Column pruning
    keeps the scan at (url, html).
    """
    tags = pages.select(
        F.col("url").alias("src"),
        F.explode(F.regexp_extract_all(
            F.col("html").cast("string"),
            F.lit(ANCHOR_RE), F.lit(0))).alias("tag"),
    )
    return tags.select(
        "src",
        F.regexp_extract("tag", ANCHOR_RE, 1).alias("dst"),
        F.regexp_extract("tag", ANCHOR_RE, 2).alias("anchor"),
    )


def degree_stats(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(node, out_deg, in_deg, dangling) over deduped self-loop-free
    edges restricted to the node set — the same normalization
    :func:`pagerank` applies, so its dangling set is auditable."""
    e = _normalize_edges(nodes, edges)
    out_d = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_deg"))
    in_d = e.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_deg"))
    return (nodes.select("node")
            .join(out_d, "node", "left")
            .join(in_d, "node", "left")
            .select(
                "node",
                F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
                (F.coalesce("out_deg", F.lit(0)) == 0)
                .alias("dangling")))


def _normalize_edges(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Dedup (src, dst), drop self-loops, keep only edges whose BOTH
    endpoints are in ``nodes`` (semi-joins — never widens edges)."""
    n_src = nodes.select(F.col("node").alias("src"))
    n_dst = nodes.select(F.col("node").alias("dst"))
    return (edges.select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .join(n_src, "src", "semi")
            .join(n_dst, "dst", "semi"))


def pagerank(nodes: DataFrame, edges: DataFrame, n_iter: int = 10,
             damping: float = 0.85) -> DataFrame:
    """Damped PageRank → (node, pr), Σpr = 1.

    ``nodes``: one column ``node`` (any orderable type — url string
    or doc id).  ``edges``: columns ``src``, ``dst`` in the same id
    space.  Fixed ``n_iter`` power iterations (deterministic — the
    oracle unrolls the same count), no early-exit tolerance check so
    two engines can't disagree on the stop round.
    """
    nodes = nodes.select("node").distinct().localCheckpoint()
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("pr"))
    e = _normalize_edges(nodes, edges)
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # contribution weights, co-partitioned with the per-iteration
    # rank join key and persisted ONCE — the corpus-sized table never
    # moves again
    ew = (e.join(out_deg, "src")
          .select("src", "dst",
                  (F.lit(1.0) / F.col("out_deg")).alias("w"))
          .repartition("src").persist())
    ew.count()
    # out-degree-0 nodes, fixed across iterations; their summed rank
    # is the per-round dangling scalar (computed DIRECTLY, the same
    # expression the oracle evaluates — not as 1 - linked_mass, which
    # would differ from it by float residue).  The scalar stays
    # IN-PLAN as a broadcast 1-row cross join — collecting it to the
    # driver would add a second barrier/job per iteration (2K jobs
    # for K rounds); same IEEE double ops either way.
    dang_nodes = (nodes.join(
        out_deg.select(F.col("src").alias("node")), "node", "anti")
        .localCheckpoint())
    pr = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    base = (1.0 - damping) / n
    try:
        for _ in range(n_iter):
            # one materialization per round; pr feeds BOTH the
            # dangling agg and the contribution join below, so an
            # untruncated plan would double per round
            pr = pr.localCheckpoint()
            dang = (pr.join(dang_nodes, "node", "semi")
                    .agg(F.coalesce(F.sum("pr"), F.lit(0.0))
                         .alias("dm")))
            contrib = (ew.join(pr.withColumnRenamed("node", "src"),
                               "src")
                       .groupBy(F.col("dst").alias("node"))
                       .agg(F.sum(F.col("w") * F.col("pr"))
                            .alias("c")))
            pr = (nodes.join(contrib, "node", "left")
                  .crossJoin(F.broadcast(dang))
                  .select("node",
                          (F.lit(base) + F.lit(damping)
                           * (F.coalesce("c", F.lit(0.0))
                              + F.col("dm") / F.lit(float(n))))
                          .alias("pr")))
        return pr.localCheckpoint()
    finally:
        ew.unpersist()
