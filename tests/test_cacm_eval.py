"""The REAL reference evaluation set (SURVEY.md §2.6, north rule):
parse /root/reference/data/CACM (cacm.all, common_words, query.text,
qrels.text), build the engine index over the actual 3,204-doc corpus,
and assert 100% rank-identity + reference-math MAP against the
pure-Python oracle on the actual 64 queries x 4 weighting schemes —
not just the synthetic set."""

from __future__ import annotations

import os

import numpy as np
import pytest

from oracle.pyoracle import OracleIndex
from rechercheinfoweb_spark.operators import evaluate
from rechercheinfoweb_spark.operators.index_build import build_index
from rechercheinfoweb_spark.operators.query_vector import (
    IndexReader, vector_topk_batch,
)
from rechercheinfoweb_spark.sources import cacm

pytestmark = pytest.mark.skipif(
    not os.path.isdir(cacm.CACM_DIR), reason="reference data absent")


@pytest.fixture(scope="module")
def cacm_sw():
    return cacm.cacm_stopwords()


@pytest.fixture(scope="module")
def cacm_pages_df(spark):
    df = cacm.cacm_pages(spark)
    df.persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def cacm_index(spark, cacm_pages_df, cacm_sw, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cacm_index"))
    build_index(spark, cacm_pages_df, out, n_chunks=2, n_buckets=8,
                stopwords=cacm_sw)
    return out


@pytest.fixture(scope="module")
def cacm_oracle(cacm_pages_df, cacm_sw):
    return OracleIndex.build(
        [(r["url"], r["text"]) for r in
         cacm_pages_df.select("url", "text").collect()],
        stopwords=cacm_sw)


def test_corpus_and_eval_set_shape(cacm_pages_df, cacm_sw):
    # BASELINE.md reference-pinned counts
    assert cacm_pages_df.count() == 3204
    # 429 lines, but "would" appears twice — the Go map (main.go:34-45)
    # holds 428 distinct words, as does our frozenset
    assert len(cacm_sw) == 428
    queries = cacm.cacm_queries()
    qrels = cacm.cacm_qrels()
    assert len(queries) == 64
    assert len(qrels) == 52
    assert sum(len(v) for v in qrels.values()) == 796
    # first query spot-check (query.text .I 1); the reference keeps
    # the line verbatim incl. its leading space (Populate buf.Write)
    assert "What articles exist which deal with TSS" in queries[1]


def test_first_doc_tokens_golden(cacm_pages_df):
    """Record 1 (.T only — no .W/.K): the title line, with the
    scanner's quirk that nothing else of the record is indexed."""
    row = cacm_pages_df.where("url = 'cacm/0001'").collect()[0]
    assert row["text"] == ("Preliminary Report-International "
                           "Algebraic Language")


@pytest.mark.parametrize("scheme", ["raw", "norm", "half", "bm25"])
def test_rank_identity_real_queries(spark, cacm_index, cacm_oracle,
                                    cacm_sw, scheme):
    """All 64 real CACM queries, FULL ranked lists (the reference
    eval walks the whole list, precision_recall.go:139-152):
    rank-identical with bit-equal scores vs the oracle."""
    queries = cacm.cacm_queries()
    n = cacm_oracle.n_docs
    results = vector_topk_batch(spark, cacm_index, queries,
                                scheme=scheme, k=n, stopwords=cacm_sw)
    got: dict[int, list] = {}
    for r in results.orderBy("qid", "rank").collect():
        got.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    for qid, q in queries.items():
        exp = cacm_oracle.vector_query(q, scheme, k=n)
        assert got.get(qid, []) == exp, f"{scheme} qid={qid}"


def test_map_real_queries_matches_reference_math(spark, cacm_index,
                                                 cacm_oracle, cacm_sw):
    """Spark V1-V3 MAP over the real query set equals the
    reference-math reimplementation (strict >, i/256 grid, <2-point
    skip) to 1e-9, per scheme."""
    queries = cacm.cacm_queries()
    qrels = cacm.cacm_qrels()
    n = cacm_oracle.n_docs
    for scheme in ("norm", "bm25"):
        results = vector_topk_batch(spark, cacm_index, queries,
                                    scheme=scheme, k=n,
                                    stopwords=cacm_sw)
        pts = evaluate.pr_points(results,
                                 evaluate.qrels_df(spark, qrels))
        got = evaluate.mean_average_precision(pts)
        ranked = {qid: [d for d, _ in
                        cacm_oracle.vector_query(q, scheme, k=n)]
                  for qid, q in queries.items()}
        want = _py_map_reference(ranked, qrels)
        assert abs(got - want) < 1e-9, (scheme, got, want)
        assert got > 0.05, f"degenerate MAP {got} for {scheme}"


def _py_map_reference(ranked, qrels, n_samples=evaluate.N_SAMPLES):
    curves = []
    for qid, rels in qrels.items():
        pts, hits = [], 0
        for i, d in enumerate(ranked.get(qid, [])):
            if d in rels:
                hits += 1
                pts.append((hits / len(rels), hits / (i + 1)))
        if len(pts) >= 2:
            curves.append(pts)
    samples = [i / n_samples for i in range(n_samples)]
    per_q = [[max((p for r, p in pts if r > s), default=0.0)
              for s in samples] for pts in curves]
    return float(np.mean(np.mean(np.array(per_q), axis=0)))
