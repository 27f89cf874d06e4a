"""Pure-Python oracle engine — reference-faithful semantics, no Spark.

Re-implements the reference's full retrieval semantics (tokenize →
filter → stem → tf/idf weights → boolean set ops / vector scoring →
rank) over an in-memory corpus, mirroring /root/reference exactly
where the Go code is deterministic and canonicalizing where it is not
(SURVEY.md §7): docIDs are url-ordered, ranking ties break by doc_id
ascending.

Float discipline: formulas come from
``rechercheinfoweb_spark.functions.scoring`` — that module IS the
numeric spec, shared so engine and oracle produce bit-identical
float64 weights — and per-doc scores accumulate over query terms in
sorted-term order with occurrence-multiplicity scaling, exactly like
the engine's shard kernel.  The Spark engine must match the oracle
rank-identically with score equality at 1e-9 (we assert exact
equality in practice).

The index structure here is deliberately naive (dicts of lists): the
oracle checks *semantics*, the Spark engine owns *scale*.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from rechercheinfoweb_spark.functions import scoring
from rechercheinfoweb_spark.functions.tokenizer import (
    STOPWORDS, bool_query_term, index_tokens, raw_tokens,
    vector_query_terms,
)
from rechercheinfoweb_spark.operators.query_bool import (
    And, Not, Or, Word, parse_boolean,
)

SCHEME_COL = {"raw": 0, "norm": 1, "half": 2, "bm25": 3}


@dataclass
class OracleIndex:
    n_docs: int = 0
    avgdl: float = 0.0
    sum_dl: int = 0
    n_raw_tokens: int = 0
    postings: dict = field(default_factory=dict)   # term -> [(doc_id, tf)]
    doc_dl: dict = field(default_factory=dict)
    doc_max_tf: dict = field(default_factory=dict)
    doc_url: dict = field(default_factory=dict)
    stopwords: frozenset = STOPWORDS

    @classmethod
    def build(cls, pages: list[tuple[str, str]],
              stopwords: frozenset[str] = STOPWORDS) -> "OracleIndex":
        """*pages* = [(url, text)]; docIDs are 1..N in url order."""
        idx = cls(stopwords=stopwords)
        for doc_id, (url, text) in enumerate(
                sorted(pages, key=lambda p: p[0]), start=1):
            raw = raw_tokens(text)
            counts = Counter(
                t for t in index_tokens(text, stopwords))
            dl = sum(counts.values())
            idx.doc_dl[doc_id] = dl
            idx.doc_max_tf[doc_id] = max(counts.values()) if counts else 0
            idx.doc_url[doc_id] = url
            idx.sum_dl += dl
            idx.n_raw_tokens += len(raw)
            idx.n_docs += 1
            for term, tf in counts.items():
                idx.postings.setdefault(term, []).append((doc_id, tf))
        for plist in idx.postings.values():
            plist.sort()
        idx.avgdl = idx.sum_dl / idx.n_docs if idx.n_docs else 0.0
        return idx

    # -- vector ------------------------------------------------------

    def term_weights(self, term: str) -> dict[int, np.ndarray]:
        """doc_id -> float64[4] weights, reference formulas."""
        plist = self.postings.get(term)
        if not plist:
            return {}
        df = len(plist)
        idf_v = float(scoring.idf(self.n_docs, df))
        bidf_v = float(scoring.bm25_idf(self.n_docs, df))
        ids = [d for d, _ in plist]
        tfs = np.array([tf for _, tf in plist], dtype=np.int64)
        dls = np.array([self.doc_dl[d] for d in ids], dtype=np.int64)
        mtfs = np.array([self.doc_max_tf[d] for d in ids], dtype=np.int64)
        w = scoring.posting_weights(tfs, dls, mtfs, idf_v, bidf_v,
                                    self.avgdl)
        return {d: w[i] for i, d in enumerate(ids)}

    def vector_query(self, query: str, scheme: str = "bm25",
                     k: int = 20) -> list[tuple[int, float]]:
        terms = vector_query_terms(query, self.stopwords)
        mult = Counter(terms)
        col = SCHEME_COL[scheme]
        scores: dict[int, np.float64] = {}
        for term in sorted(mult):
            m = np.float64(mult[term])
            for doc_id, w in self.term_weights(term).items():
                scores[doc_id] = scores.get(doc_id, np.float64(0.0)) \
                    + m * w[col]
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(d, float(s)) for d, s in ranked[:k]]

    # -- boolean -----------------------------------------------------

    def _term_ids(self, word: str) -> set[int]:
        return {d for d, _ in self.postings.get(bool_query_term(word), [])}

    def _eval(self, node, prec: set[int]) -> set[int]:
        if isinstance(node, Word):
            return self._term_ids(node.w)
        if isinstance(node, Not):
            return prec - self._eval(node.b, set())
        if isinstance(node, And):
            b1, b2 = node.b1, node.b2
            if b1.is_not() and not b2.is_not():
                b1, b2 = b2, b1
            r1 = self._eval(b1, prec)
            r2 = self._eval(b2, r1)
            return r1 & r2
        if isinstance(node, Or):
            return self._eval(node.b1, prec) | self._eval(node.b2, prec)
        raise TypeError(node)

    def boolean_query(self, query: str) -> list[int]:
        ast = parse_boolean(query)
        if ast is None:
            return []
        return sorted(self._eval(ast, set()))
