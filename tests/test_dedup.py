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


def test_dup_ngram_span_stats_brute_force(spark, small_docs):
    """Interval-merge coverage == naive position-set expansion, on
    real corpus text plus crafted overlap/self-repeat/short docs."""
    n = 3
    crafted = spark.createDataFrame(
        [(900001, "a b c x y z"),          # cross-doc dup with next
         (900002, "q a b c r s"),
         (900003, "p q r p q r p q r"),    # self-repeating template
         (900004, "totally fresh words appear once"),
         (900005, "hi there")],            # shorter than one n-gram
        "doc_id long, text string")
    docs = small_docs.unionByName(crafted)

    # brute force in python over the SQL-portable tokenizer
    import re
    toks = {r["doc_id"]:
            [t.lower() for t in re.split(r"[^a-zA-Z0-9]+", r["text"])
             if t]
            for r in docs.collect()}
    grams: dict[int, list[str]] = {
        d: [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]
        for d, t in toks.items()}
    from collections import Counter
    occ = Counter(g for gs in grams.values() for g in gs)
    want = {}
    for d, t in toks.items():
        covered: set[int] = set()
        dup_positions = [i for i, g in enumerate(grams[d])
                         if occ[g] >= 2]
        for i in dup_positions:
            covered.update(range(i, i + n))
        frac = round(len(covered) / max(len(t), 1), 6)
        want[d] = (len(t), len(dup_positions), len(covered), frac)

    got = {r["doc_id"]: (r["n_tokens"], r["dup_grams"],
                         r["covered_tokens"], r["dup_span_frac"])
           for r in dedup.dup_ngram_span_stats(docs, n=n).collect()}
    assert got == want
    # the crafted cases hit every branch: cross-doc dup, full
    # coverage via overlapping intervals, zero-dup, sub-n-gram doc
    assert got[900003] == (9, 7, 9, 1.0)
    assert got[900005] == (2, 0, 0, 0.0)
