"""Serving facade — the reference's HTTP search surface as a library.

Mirrors server.go's request shape (server.go:62-125): a query string,
a type (``boolean`` | ``vectorial``), a weighting scheme
(``raw|norm|half|bm25``; the reference's three plus BM25), and a
page (20 results/page, server.go:17-19).  Results are projected to
(doc_id, url, score) via the docs table (refToResult,
search.go:95-105; our titles ARE the urls per the web_pages model),
and a point lookup serves single documents (cacm_server.go:21-48).

A user of the reference switches here by replacing HTTP calls with
:class:`SearchService` calls — or keeps speaking HTTP to
:mod:`.httpserver`, the stdlib-only twin of server.go's routes over
the in-process :class:`~.operators.serve_local.LocalSearcher`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession, functions as F

from .operators.query_bool import boolean_search
from .operators.query_vector import IndexReader, vector_topk

PAGE_SIZE = 20  # server.go:17-19


@dataclass
class SearchResult:
    doc_id: int
    url: str
    score: float | None


class SearchService:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.reader = IndexReader(spark, index_dir)
        # docs projection is consulted per request — cache the
        # (small: 3 columns) dimension across requests
        self._docs = self.reader.docs().select(
            "doc_id", "url", "dl").persist()

    def search(self, query: str, qtype: str = "vectorial",
               weight: str = "bm25", page: int = 0,
               page_size: int = PAGE_SIZE) -> list[SearchResult]:
        """One results page, reference semantics per qtype."""
        lo, hi = page * page_size, (page + 1) * page_size
        if qtype == "boolean":
            ids = boolean_search(self.spark, self.reader, query)
            rows = (ids.join(self._docs, "doc_id")
                    .orderBy("doc_id")
                    .offset(lo).limit(page_size).collect())
            return [SearchResult(r["doc_id"], r["url"], None)
                    for r in rows]
        if qtype == "vectorial":
            top = vector_topk(self.spark, self.reader, query,
                              scheme=weight, k=hi)
            rows = (top.join(F.broadcast(self._docs.select(
                        "doc_id", "url")), "doc_id")
                    .orderBy(F.desc("score"), F.asc("doc_id"))
                    .offset(lo).limit(page_size).collect())
            return [SearchResult(r["doc_id"], r["url"], r["score"])
                    for r in rows]
        raise ValueError(f"unknown qtype {qtype!r}")

    def doc(self, doc_id: int) -> dict | None:
        """Point lookup (cacm_server.go:21-48 analog)."""
        rows = self._docs.where(F.col("doc_id") == doc_id).collect()
        if not rows:
            return None
        r = rows[0]
        return {"doc_id": r["doc_id"], "url": r["url"], "dl": r["dl"]}

    def stats(self) -> dict:
        """Corpus stats page (stat.go / perf page analog)."""
        r = self.spark.read.parquet(
            self.reader.paths.corpus_stats).collect()[0]
        return r.asDict()

    def close(self) -> None:
        self._docs.unpersist()
