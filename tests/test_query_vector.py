"""Vector-query parity: rank-identical, score-exact vs the oracle,
WAND pruning exactness (SURVEY.md §5.2)."""

import pytest

from rechercheinfoweb_spark.operators.query_vector import vector_topk

QUERIES = [
    "search engine ranking",
    "Spark shuffle partition broadcast",
    "running skies connection",
    "the of and in",                 # all stopwords → empty
    "webpage content information",   # hot terms, idf=0 path
    "varint delta snappy BM25 WAND Zipf Heaps",
    "missingterm search",
    "search search engine",          # duplicate term scores twice
]


@pytest.mark.parametrize("scheme", ["raw", "norm", "half", "bm25"])
def test_rank_identical_scores_exact(spark, reader, oracle_index, scheme):
    for q in QUERIES:
        got = [(r["doc_id"], r["score"]) for r in
               vector_topk(spark, reader, q, scheme, k=10).collect()]
        exp = oracle_index.vector_query(q, scheme, k=10)
        assert got == exp, f"{scheme}: {q!r}"


def test_wand_equals_exhaustive(spark, reader):
    for q in QUERIES:
        a = [(r["doc_id"], r["score"]) for r in
             vector_topk(spark, reader, q, "bm25", k=10,
                         use_pruning=True).collect()]
        b = [(r["doc_id"], r["score"]) for r in
             vector_topk(spark, reader, q, "bm25", k=10,
                         use_pruning=False).collect()]
        assert a == b, q


def test_pruning_auto_routes_and_matches(spark, reader):
    """"auto" prunes only when some term is selective (df ≤ N/4 ⇔
    idf ≥ ln 4); either branch returns identical rows."""
    from collections import Counter

    from rechercheinfoweb_spark.operators.query_vector import (
        _pruning_pays, vector_query_terms, STOPWORDS,
    )
    def params_of(q):
        terms = vector_query_terms(q, STOPWORDS)
        return reader.term_params(dict(Counter(terms)))
    # hot terms: df ≈ N on the fixture corpus → no pruning
    assert not _pruning_pays(params_of("webpage content information"))
    # df=1 tail term on the fixture corpus → pruning pays
    assert _pruning_pays(params_of("term0556 search"))
    for q in QUERIES:
        auto = [(r["doc_id"], r["score"]) for r in
                vector_topk(spark, reader, q, "bm25", k=10,
                            use_pruning="auto").collect()]
        off = [(r["doc_id"], r["score"]) for r in
               vector_topk(spark, reader, q, "bm25", k=10,
                           use_pruning=False).collect()]
        assert auto == off, q


def test_k_larger_than_matches(spark, reader, oracle_index):
    got = [(r["doc_id"], r["score"]) for r in
           vector_topk(spark, reader, "Zipf", "bm25", k=10**6).collect()]
    exp = oracle_index.vector_query("Zipf", "bm25", k=10**6)
    assert got == exp


def test_with_urls(spark, reader, oracle_index):
    rows = vector_topk(spark, reader, "search engine", "bm25", k=5,
                       with_urls=True).collect()
    assert [r["url"] for r in rows] == [
        oracle_index.doc_url[d] for d, _ in
        oracle_index.vector_query("search engine", "bm25", k=5)]
