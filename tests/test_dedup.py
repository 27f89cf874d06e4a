"""Dedup operator tests: simhash chunk-blocking must have EXACT
recall at any radius (the round-1 4-chunk split silently missed
pairs for radius > 3), and the LSH hot-bucket guard must drop only
degenerate buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rechercheinfoweb_spark.operators import dedup


@pytest.fixture(scope="module")
def small_docs(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").limit(120).persist())


@pytest.mark.parametrize("radius", [3, 6])
def test_simhash_blocking_exact_recall(spark, small_docs, radius):
    """Blocked candidate generation == brute-force hamming pairs."""
    sims = {r["doc_id"]: r["simhash"]
            for r in dedup.simhash(small_docs).collect()}
    ids = sorted(sims)
    want = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
            if bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")
            <= radius}
    got = {(r["doc_a"], r["doc_b"]) for r in
           dedup.simhash_near_pairs(small_docs, radius=radius).collect()}
    assert got == want


def test_chunk_bounds_cover_64_bits():
    for n in (1, 2, 4, 7, 13, 64):
        bounds = dedup._chunk_bounds(n)
        assert len(bounds) == n
        assert sum(w for _, w in bounds) == 64
        pos = 0
        for shift, width in bounds:
            assert shift == pos and width >= 1
            pos += width


def test_minhash_max_bucket_guard(spark):
    """A degenerate corpus (many identical docs) must not explode:
    with a tight cap the hot bucket is dropped; pairs from
    discriminative buckets survive."""
    rows = ([(i, "the same boilerplate text again and again")
             for i in range(40)]
            + [(100, "a unique document about spark internals"),
               (101, "a unique document about spark internals")])
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.minhash_lsh_pairs(docs, max_bucket=None).count()
    capped = dedup.minhash_lsh_pairs(docs, max_bucket=10)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # the 40-doc boilerplate clique (780 pairs) is gone...
    assert uncapped >= 780
    assert all(a >= 100 for a, _ in got)
    # ...but the small near-dup pair is still found
    assert (100, 101) in got
