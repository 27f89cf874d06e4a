"""Driver-local serving path: bit-equal to the Spark path, and fast
enough to be an interactive answer (the reference serves from RAM)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from rechercheinfoweb_spark.functions.xxhash import xxh64
from rechercheinfoweb_spark.operators.query_vector import vector_topk
from rechercheinfoweb_spark.operators.serve_local import LocalSearcher

QUERIES = ("search engine ranking", "Zipf postings merge",
           "webpage content information",  # df≈N hot terms
           "running runner runs", "absentterm search")


def test_xxhash_matches_spark(spark):
    terms = ["", "a", "ab", "abcd", "abcdefg", "abcdefgh",
             "x" * 31, "x" * 32, "x" * 33, "x" * 100,
             "state-of-the-art", "données-éphémères", "日本語"]
    got = {r["t"]: r["h"] for r in spark.createDataFrame(
        [(t,) for t in terms], "t string")
        .select("t", F.xxhash64("t").alias("h")).collect()}
    for t in terms:
        assert xxh64(t.encode("utf-8")) == got[t], t


def test_local_matches_spark_engine(spark, reader, index_dir):
    local = LocalSearcher(index_dir)
    for scheme in ("raw", "norm", "half", "bm25"):
        for q in QUERIES:
            a = local.vector_query(q, scheme, k=15)
            b = [(r["doc_id"], r["score"]) for r in
                 vector_topk(spark, reader, q, scheme, k=15).collect()]
            assert a == b, (scheme, q)  # bit-equal scores, same ranks


def test_local_boolean_matches_oracle(oracle_index, index_dir):
    local = LocalSearcher(index_dir)
    for q in ("search AND engine", "search OR NOT engine AND index",
              "running NOT runs", "search engine ranking"):
        assert local.boolean_query(q) == oracle_index.boolean_query(q), q


def test_local_urls(oracle_index, index_dir):
    local = LocalSearcher(index_dir)
    top = local.vector_query("search engine", "bm25", k=5,
                             with_urls=True)
    for doc_id, _score, url in top:
        assert oracle_index.doc_url[doc_id] == url


def test_local_latency(index_dir):
    local = LocalSearcher(index_dir)
    local.vector_query("search engine", "bm25")  # warm the bucket cache
    t0 = time.time()
    n = 50
    for i in range(n):
        local.vector_query("search engine ranking", "bm25", k=20)
    per = (time.time() - t0) / n
    # the Spark job path costs ~1.4 s/query; local serving must be
    # interactive (generous bound — typically single-digit ms)
    assert per < 0.1, f"{per * 1000:.1f} ms/query"
