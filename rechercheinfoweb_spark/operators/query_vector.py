"""Ranked (vector) query engine — SURVEY.md §2.4 Q7-Q11 + BM25/WAND.

Reference pipeline (vector_query.go:56-77): split query (letters+
digits) → stopword-filter raw words → stem len>3 → fetch posting list
per term → k-way merge summing the selected precomputed weight →
full sort desc.  Duplicated query terms contribute twice
(vector_query.go:33-35); the reference's sort is unstable on ties —
we canonicalize with a (score desc, doc_id asc) tiebreak, and the
oracle does the same (SURVEY.md §7 determinism).

Spark formulation: the query's terms select postings rows via
bucket partition pruning + term filter; scoring runs document-
partitioned — each ``salt`` (doc-range shard created at build time)
holds every query term's postings for its own doc subset, so one
``applyInPandas`` group scores that shard independently and emits its
local top-k; the global answer is ``orderBy(score desc, doc_id
asc).limit(k)`` (Catalyst TakeOrderedAndProject).  This is the
classic document-partitioned distributed search fan-out: at 10^12
docs each shard scores in parallel and only k rows per shard reach
the final merge.

Block-max pruning (north rule): within a shard the kernel first
builds per-doc score *upper bounds* from block-max metadata alone
(ids decode, no weight decode), establishes a threshold θ from the
exact scores of the top-k docs by upper bound (a valid lower bound on
the true kth score), then skips every block whose docs all fall
below θ.  Results are exact — pruned docs are provably outside the
top-k — so WAND-on and WAND-off return rank-identical lists, which
``tests/test_query_vector.py`` pins.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import codec
from ..functions.tokenizer import STOPWORDS, vector_query_terms
from .index_build import IndexPaths, term_bucket

SCHEME_COL = {"raw": 0, "norm": 1, "half": 2, "bm25": 3}


class IndexReader:
    """Handle on a built index directory."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.paths = IndexPaths(index_dir)
        stats = spark.read.parquet(self.paths.corpus_stats).collect()[0]
        self.n_docs = stats["n_docs"]
        self.avgdl = stats["avgdl"]
        self.n_chunks = stats["n_chunks"]
        self.n_buckets = stats["n_buckets"]
        self.vocabulary = stats["vocabulary"]
        # chunk registry: salt/chunk -> (first doc_id, chunk size);
        # shard kernels map absolute ids to dense positions with it
        self.salt_map: dict[int, tuple[int, int]] = {
            r["chunk"]: (r["min_id"], r["n_docs"])
            for r in spark.read.parquet(self.paths.chunks).collect()}
        # one file-listing/schema pass for the postings table, reused
        # by every query through this reader
        self._postings = spark.read.parquet(self.paths.postings)

    def postings_for(self, terms: list[str]) -> DataFrame:
        """Posting rows for *terms*, bucket-pruned.

        The bucket predicate is computed with the same Spark-side
        xxhash64 expression the build used, so the parquet scan reads
        only the matching ``bucket=`` partitions (partition pruning —
        verify with .explain: PartitionFilters on ``bucket``)."""
        if not terms:
            return self._postings.limit(0)
        uniq = sorted(set(terms))
        tdf = self.spark.createDataFrame(
            [(t,) for t in uniq], "term string")
        # terms are already unique — plain collect, no distinct shuffle
        buckets = sorted({r["b"] for r in tdf.select(
            term_bucket(F.col("term"), self.n_buckets).alias("b"))
            .collect()})
        return (self._postings
                .where(F.col("bucket").isin(buckets))
                .where(F.col("term").isin(uniq)))

    def docs(self) -> DataFrame:
        return self.spark.read.option("basePath", self.paths.docs).parquet(
            *[f"{self.paths.docs}/chunk={c}" for c in self.salt_map])


def _score_shard_kernel(multiplicity: dict[str, int], scheme: str,
                        k: int, salt_map: dict[int, tuple[int, int]],
                        use_pruning: bool):
    """applyInPandas kernel over one salt shard's posting rows.

    ``salt_map`` maps each shard to its contiguous (first_doc_id,
    size) range; ids become dense positions as ``id - base``."""
    wcol = SCHEME_COL[scheme]

    def fn(pdf):
        import pandas as pd
        if len(pdf) == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
        pdf = pdf.sort_values("term", kind="mergesort")
        salt = int(pdf["salt"].iloc[0])
        base, cap = salt_map[salt]
        cap += 2  # dense doc-position space
        # pass 1: decode ids only; per-doc upper bounds from block max
        decoded = []  # (mult, positions, block_max, data, n)
        ub = np.zeros(cap, dtype=np.float64)
        present = np.zeros(cap, dtype=bool)  # any-posting docs score
        # even when idf=0 (df=N hot terms), like the reference merge
        for term, blocks in zip(pdf["term"], pdf["blocks"]):
            mult = np.float64(multiplicity[term])
            for blk in blocks:
                n = int(blk["n"])
                data = bytes(blk["data"])
                deltas, off = codec.decode_varints(data, n)
                ids = np.cumsum(deltas.astype(np.int64))
                pos = ids - base
                bmax = float((blk["max_w_raw"], blk["max_w_norm"],
                              blk["max_w_half"], blk["max_bm25"])[wcol])
                ub[pos] += mult * bmax
                present[pos] = True
                decoded.append((mult, ids, pos, bmax, data, n, off))

        def add_exact(into: np.ndarray, mask_pos=None):
            # accumulate exact contributions in term-sorted block order
            for mult, ids, pos, bmax, data, n, off in decoded:
                if mask_pos is not None:
                    sel = mask_pos[pos]
                    if not sel.any():
                        continue
                else:
                    sel = None
                w = np.frombuffer(
                    data, dtype=np.float64, count=n * codec.N_WEIGHTS,
                    offset=_weights_offset(data, n, off),
                ).reshape((n, codec.N_WEIGHTS), order="F")[:, wcol]
                if sel is None:
                    into[pos] += mult * w
                else:
                    np.add.at(into, pos[sel], mult * w[sel])

        exact = np.zeros(cap, dtype=np.float64)
        if not use_pruning:
            add_exact(exact)
            cand = np.nonzero(present)[0]
        else:
            # θ = kth-best exact score among the top-k docs by upper
            # bound — a lower bound on the true kth score, so every
            # doc (and block) strictly below θ is provably out.
            nz = np.nonzero(present)[0]
            if nz.size == 0:
                return pd.DataFrame({"doc_id": [], "score": []})
            top_by_ub = nz[np.argsort(-ub[nz], kind="stable")[:k]]
            mask0 = np.zeros(cap, dtype=bool)
            mask0[top_by_ub] = True
            add_exact(exact, mask0)
            seed_scores = exact[top_by_ub]
            theta = (np.sort(seed_scores)[-k] if seed_scores.size >= k
                     else -np.inf)
            cand_mask = present & (ub >= theta)
            exact = np.zeros(cap, dtype=np.float64)
            add_exact(exact, cand_mask)
            cand = np.nonzero(cand_mask)[0]

        if cand.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
        scores = exact[cand]
        order = np.lexsort((cand, -scores))[:k]
        sel = cand[order]
        return pd.DataFrame({
            "doc_id": (sel + base).astype(np.int64),
            "score": scores[order],
        })

    return fn


def _weights_offset(data: bytes, n: int, ids_end: int) -> int:
    """Offset of the float64 weights section: skip the tf varints."""
    _, off = codec.decode_varints(data, n, ids_end)
    return off


def _score_shard_batch_kernel(query_mults: dict[int, dict[str, int]],
                              scheme: str, k: int,
                              salt_map: dict[int, tuple[int, int]]):
    """applyInPandas kernel over one salt shard's posting rows,
    scoring EVERY query of the batch in a single pass.

    Each term's blocks decode once; each query then accumulates
    mult x weight over its own terms in sorted-term order — the same
    float-op order as the single-query kernel and the oracle, so
    batch results are bit-identical to one-at-a-time results.  Used
    by the evaluation harness (SURVEY.md §2.6): 64 queries cost one
    distributed pass, not 64 driver round-trips."""
    wcol = SCHEME_COL[scheme]
    all_terms = sorted({t for m in query_mults.values() for t in m})

    def fn(pdf):
        import pandas as pd
        cols = {"qid": [], "doc_id": [], "score": []}
        if len(pdf) == 0:
            return pd.DataFrame(cols)
        salt = int(pdf["salt"].iloc[0])
        base, cap = salt_map[salt]
        cap += 2
        by_term: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
        for term, blocks in zip(pdf["term"], pdf["blocks"]):
            decoded = []
            for blk in blocks:
                n = int(blk["n"])
                data = bytes(blk["data"])
                deltas, off = codec.decode_varints(data, n)
                ids = np.cumsum(deltas.astype(np.int64))
                w = np.frombuffer(
                    data, dtype=np.float64, count=n * codec.N_WEIGHTS,
                    offset=_weights_offset(data, n, off),
                ).reshape((n, codec.N_WEIGHTS), order="F")[:, wcol]
                decoded.append((ids - base, w))
            by_term[term] = decoded
        for qid in sorted(query_mults):
            mult = query_mults[qid]
            exact = np.zeros(cap, dtype=np.float64)
            present = np.zeros(cap, dtype=bool)
            for term in sorted(mult):
                m = np.float64(mult[term])
                for pos, w in by_term.get(term, ()):
                    exact[pos] += m * w
                    present[pos] = True
            cand = np.nonzero(present)[0]
            if cand.size == 0:
                continue
            scores = exact[cand]
            order = np.lexsort((cand, -scores))[:k]
            sel = cand[order]
            cols["qid"].extend([qid] * len(sel))
            cols["doc_id"].extend((sel + base).tolist())
            cols["score"].extend(scores[order].tolist())
        return pd.DataFrame(cols)

    fn.terms = all_terms
    return fn


def vector_topk_batch(spark: SparkSession,
                      index_dir: str | IndexReader,
                      queries: dict[int, str], scheme: str = "bm25",
                      k: int = 20,
                      stopwords: frozenset[str] = STOPWORDS
                      ) -> DataFrame:
    """Top-k for a whole query batch: (qid, rank, doc_id, score).

    Rank order per qid = (score desc, doc_id asc), identical to
    :func:`vector_topk` per query."""
    from pyspark.sql.window import Window

    reader = (index_dir if isinstance(index_dir, IndexReader)
              else IndexReader(spark, index_dir))
    mults = {qid: dict(Counter(vector_query_terms(q, stopwords)))
             for qid, q in queries.items()}
    mults = {qid: m for qid, m in mults.items() if m}
    kern = _score_shard_batch_kernel(mults, scheme, k, reader.salt_map)
    rows = reader.postings_for(kern.terms)
    scored = (rows.select("term", "salt", "blocks")
              .groupBy("salt")
              .applyInPandas(kern,
                             schema="qid int, doc_id long, score double"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "rank", "doc_id", "score"))


def vector_topk(spark: SparkSession, index_dir: str | IndexReader,
                query: str, scheme: str = "bm25", k: int = 20,
                use_pruning: bool = True,
                stopwords: frozenset[str] = STOPWORDS,
                with_urls: bool = False) -> DataFrame:
    """Top-k ranked retrieval. Returns (doc_id, score[, url]) with
    rank order = (score desc, doc_id asc)."""
    reader = (index_dir if isinstance(index_dir, IndexReader)
              else IndexReader(spark, index_dir))
    terms = vector_query_terms(query, stopwords)
    mult = dict(Counter(terms))
    rows = reader.postings_for(list(mult))
    scored = rows.select("term", "salt", "blocks").groupBy("salt").applyInPandas(
        _score_shard_kernel(mult, scheme, k, reader.salt_map,
                            use_pruning),
        schema="doc_id long, score double")
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    if with_urls:
        # broadcast the k-row result against the big docs table, not
        # the other way round
        docs = reader.docs().select("doc_id", "url")
        top = (docs.join(F.broadcast(top), "doc_id")
               .orderBy(F.desc("score"), F.asc("doc_id")))
    return top
