"""Driver-local serving path: interactive queries without Spark jobs.

The reference answers queries in well under a millisecond because its
whole index lives in process RAM (trie + posting slices).  The Spark
shard-kernel path (query_vector.py) is the right plan for batch
retrieval and huge corpora, but every call pays multi-hundred-ms job
scheduling — wrong for interactive serving.  This module closes that
gap while keeping ONE index artifact: it reads the SAME
bucket-partitioned postings parquet directly with pyarrow (term →
bucket via the pure-Python XXH64 twin of the build's Spark bucket
expression), caches hot buckets, and scores with the same numpy
block decode + sorted-term accumulation as the shard kernel — so
results are rank-identical with scores equal to the last bit.

Division of labor at scale (the Lucene/ES shape, reached from Spark):
Spark builds/refreshes the artifact; any number of stateless serving
processes mmap-read the bucket files they need.  A 10^12-doc index
doesn't fit one server — there you partition serving by bucket range
and fan out, which this reader supports for free because a bucket is
a self-contained directory.
"""

from __future__ import annotations

import os
from collections import Counter, OrderedDict

import numpy as np
import pyarrow.parquet as pq

from ..functions import codec
from ..functions.tokenizer import (
    STOPWORDS, bool_query_term, vector_query_terms,
)
from ..functions.xxhash import spark_term_bucket
from .query_bool import And, Not, Or, Word, parse_boolean

SCHEME_COL = {"raw": 0, "norm": 1, "half": 2, "bm25": 3}


class LocalSearcher:
    """In-process searcher over a built index directory."""

    def __init__(self, index_dir: str, max_cached_buckets: int = 64):
        stats = pq.read_table(
            os.path.join(index_dir, "corpus_stats")).to_pylist()[0]
        self.n_docs = stats["n_docs"]
        self.n_buckets = stats["n_buckets"]
        self.avgdl = stats["avgdl"]
        self.vocabulary = stats["vocabulary"]
        self._dir = index_dir
        self._max_cached = max_cached_buckets
        self._buckets: OrderedDict[int, dict] = OrderedDict()
        # decoded-postings cache: term -> (ids, weights[n,4]).  The
        # reference keeps every posting list decoded in RAM for the
        # life of the process (trie.go Refs); an LRU over hot terms
        # is the bounded-memory equivalent — steady-state hot-term
        # queries never touch the block codec.
        self._decoded: OrderedDict[str, tuple] = OrderedDict()
        self._max_decoded = 4096
        self._urls: np.ndarray | None = None

    # ---- storage ----------------------------------------------------

    def _bucket_postings(self, bucket: int) -> dict:
        """term -> list[(salt, blocks)] for one bucket dir (LRU)."""
        hit = self._buckets.get(bucket)
        if hit is not None:
            self._buckets.move_to_end(bucket)
            return hit
        path = os.path.join(self._dir, "postings", f"bucket={bucket}")
        table: dict[str, list] = {}
        if os.path.isdir(path):
            t = pq.read_table(path, columns=["term", "salt", "blocks"])
            for row in t.to_pylist():
                table.setdefault(row["term"], []).append(
                    (row["salt"], row["blocks"]))
        self._buckets[bucket] = table
        if len(self._buckets) > self._max_cached:
            self._buckets.popitem(last=False)
        return table

    def _postings(self, term: str) -> list:
        bucket = spark_term_bucket(term, self.n_buckets)
        return self._bucket_postings(bucket).get(term, [])

    def _decoded_postings(self, term: str) -> tuple:
        """(doc_ids int64[n], weights float64[n,4]) across all
        salts/blocks of *term*, decoded once and LRU-cached."""
        hit = self._decoded.get(term)
        if hit is not None:
            self._decoded.move_to_end(term)
            return hit
        ids_l, w_l = [], []
        for _salt, blocks in self._postings(term):
            for blk in blocks:
                n = int(blk["n"])
                data = bytes(blk["data"])
                deltas, off = codec.decode_varints(data, n)
                ids_l.append(np.cumsum(deltas.astype(np.int64)))
                _, off2 = codec.decode_varints(data, n, off)
                w_l.append(np.frombuffer(
                    data, dtype=np.float64,
                    count=n * codec.N_WEIGHTS, offset=off2,
                ).reshape((n, codec.N_WEIGHTS), order="F"))
        if ids_l:
            out = (np.concatenate(ids_l), np.vstack(w_l))
        else:
            out = (np.zeros(0, dtype=np.int64),
                   np.zeros((0, codec.N_WEIGHTS)))
        self._decoded[term] = out
        if len(self._decoded) > self._max_decoded:
            self._decoded.popitem(last=False)
        return out

    def _load_urls(self) -> np.ndarray:
        if self._urls is None:
            docs_dir = os.path.join(self._dir, "docs")
            t = pq.read_table(docs_dir, columns=["doc_id", "url"])
            urls = np.empty(self.n_docs + 1, dtype=object)
            ids = t.column("doc_id").to_numpy()
            for i, u in zip(ids, t.column("url").to_pylist()):
                urls[i] = u
            self._urls = urls
        return self._urls

    # ---- ranked -----------------------------------------------------

    def vector_query(self, query: str, scheme: str = "bm25",
                     k: int = 20, with_urls: bool = False,
                     stopwords: frozenset[str] = STOPWORDS) -> list:
        """Top-k [(doc_id, score[, url])] — rank-identical (scores
        bit-equal) to the Spark path: same decode, same sorted-term
        float accumulation order (a doc takes each term's
        contribution exactly once, shards are disjoint)."""
        wcol = SCHEME_COL[scheme]
        mult = Counter(vector_query_terms(query, stopwords))
        exact = np.zeros(self.n_docs + 2, dtype=np.float64)
        present = np.zeros(self.n_docs + 2, dtype=bool)
        for term in sorted(mult):
            m = np.float64(mult[term])
            ids, w = self._decoded_postings(term)
            if ids.size:
                exact[ids] += m * w[:, wcol]
                present[ids] = True
        cand = np.nonzero(present)[0]
        if cand.size == 0:
            return []
        scores = exact[cand]
        order = np.lexsort((cand, -scores))[:k]
        sel = cand[order]
        if with_urls:
            urls = self._load_urls()
            return [(int(d), float(s), urls[d])
                    for d, s in zip(sel, scores[order])]
        return [(int(d), float(s)) for d, s in zip(sel, scores[order])]

    # ---- boolean ----------------------------------------------------

    def _term_ids(self, word: str) -> np.ndarray:
        ids, _w = self._decoded_postings(bool_query_term(word))
        return np.sort(ids)

    def _eval(self, node, prec: np.ndarray) -> np.ndarray:
        empty = np.zeros(0, dtype=np.int64)
        if isinstance(node, Word):
            return self._term_ids(node.w)
        if isinstance(node, Not):
            inner = self._eval(node.b, empty)
            return np.setdiff1d(prec, inner, assume_unique=False)
        if isinstance(node, And):
            b1, b2 = node.b1, node.b2
            if b1.is_not() and not b2.is_not():
                b1, b2 = b2, b1
            r1 = self._eval(b1, prec)
            r2 = self._eval(b2, r1)
            return np.intersect1d(r1, r2)
        if isinstance(node, Or):
            return np.union1d(self._eval(node.b1, prec),
                              self._eval(node.b2, prec))
        raise TypeError(node)

    def boolean_query(self, query: str) -> list[int]:
        ast = parse_boolean(query)
        if ast is None:
            return []
        return [int(x) for x in
                self._eval(ast, np.zeros(0, dtype=np.int64))]
