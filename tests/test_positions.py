"""Positional sidecar + phrase search vs a brute-force oracle."""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from rechercheinfoweb_spark.functions.tokenizer import (
    STOPWORDS, make_index_token_mapper, raw_tokens,
)
from rechercheinfoweb_spark.operators.positions import (
    build_positions, phrase_search, phrase_terms, read_positions_meta,
)

DOCS = [
    (0, "the state of the art of search"),
    (1, "state art state of the art"),
    (2, "a a a b a a"),
    (3, ""),
    (4, "state art"),                      # adjacent: engine phrase hit
    (5, "search engines search engines search"),
    (6, "ART state ART state"),            # case matters (no lowercasing)
    (7, "state-of-the-art search engines"),  # '-' is a T1 token char
]


def brute_phrase(text: str, phrase: str, tokenizer: str):
    """Overlap-aware phrase count over the mode's token/position
    stream — independent reimplementation of the semantics."""
    if tokenizer == "sql":
        toks = [t for t in re.split("[^a-zA-Z0-9]+", text) if t]
        pos_terms = list(enumerate(toks))
        words = [t for t in re.split("[^a-zA-Z0-9]+", phrase) if t]
    else:
        mapped = make_index_token_mapper(STOPWORDS, True)
        pos_terms = []
        for i, tok in enumerate(raw_tokens(text)):
            r = mapped([tok])
            if r:
                pos_terms.append((i, r[0]))
        words = []
        for w in raw_tokens(phrase):
            r = mapped([w])
            if not r:
                return None  # unindexable word: defined as no-match
            words.append(r[0])
    if not words:
        return None
    at = {}
    for i, t in pos_terms:
        at[i] = t
    n = 0
    for i, t in pos_terms:
        if t == words[0] and all(
                at.get(i + j) == words[j] for j in range(len(words))):
            n += 1
    return n


@pytest.fixture(scope="module")
def sidecars(spark, tmp_path_factory):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {}
    for mode in ("engine", "sql"):
        d = str(tmp_path_factory.mktemp(f"pos_{mode}"))
        build_positions(spark, df, d, n_buckets=4, n_salts=3,
                        tokenizer=mode)
        out[mode] = d
    return out


PHRASES = ["state art", "a a", "search engines", "the art",
           "state of", "ART state", "a a a", "missing words",
           "search", "state-of-the-art", ""]


@pytest.mark.parametrize("mode", ["engine", "sql"])
def test_phrase_matches_brute_force(spark, sidecars, mode):
    for phrase in PHRASES:
        got = {r["doc_id"]: r["n_occ"]
               for r in phrase_search(spark, sidecars[mode],
                                      phrase).collect()}
        want = {}
        for doc_id, text in DOCS:
            n = brute_phrase(text, phrase, mode)
            if n:
                want[doc_id] = n
        assert got == want, (mode, phrase)


def test_engine_mode_respects_stopword_gap(spark, sidecars):
    # "state of the art": of/the are stopwords (unindexable) → the
    # phrase is defined unmatchable; "state art" must NOT match
    # doc 0/1's "state of the art" (gap preserved) but does match
    # the truly adjacent docs 1 ("state art ...") and 4
    assert phrase_terms("state of the art",
                        read_positions_meta(sidecars["engine"])) is None
    got = sorted(r["doc_id"] for r in
                 phrase_search(spark, sidecars["engine"],
                               "state art").collect())
    assert got == [1, 4]


def test_sql_mode_keeps_stopwords(spark, sidecars):
    got = {r["doc_id"]: r["n_occ"]
           for r in phrase_search(spark, sidecars["sql"],
                                  "state of the art").collect()}
    assert got == {0: 1, 1: 1, 7: 1}


def test_overlapping_occurrences(spark, sidecars):
    got = {r["doc_id"]: r["n_occ"]
           for r in phrase_search(spark, sidecars["sql"],
                                  "a a").collect()}
    assert got == {2: 3}  # positions 0,1,2 then 4 → pairs (0,1),(1,2),(4,5)


def test_partitioning_invariance(spark, tmp_path_factory):
    """Same sidecar bytes and same results at any input parallelism
    and salt count — the property that makes the layout safe to
    build on a 1000-executor cluster."""
    rng = np.random.default_rng(5)
    vocab = ["state", "art", "search", "engine", "web", "a", "of"]
    rows = [(i, " ".join(rng.choice(vocab, size=30)))
            for i in range(60)]
    base = spark.createDataFrame(rows, "doc_id long, text string")
    outs = []
    for nparts, nsalts in ((1, 2), (7, 5)):
        d = str(tmp_path_factory.mktemp(f"pos_inv_{nparts}"))
        build_positions(spark, base.repartition(nparts), d,
                        n_buckets=4, n_salts=nsalts, tokenizer="sql")
        outs.append(sorted(
            (r["doc_id"], r["n_occ"]) for r in
            phrase_search(spark, d, "state art").collect()))
    assert outs[0] == outs[1]
    for doc_id, text in rows:
        want = brute_phrase(text, "state art", "sql")
        got = dict(outs[0]).get(doc_id)
        assert (want or None) == got


def brute_near(text: str, query: str, tokenizer: str, k: int):
    """Min covering window over one occurrence of each distinct
    query term — exhaustive over occurrence combinations."""
    import itertools

    if tokenizer == "sql":
        toks = [t for t in re.split("[^a-zA-Z0-9]+", text) if t]
        words = [t for t in re.split("[^a-zA-Z0-9]+", query) if t]
    else:
        mapped = make_index_token_mapper(STOPWORDS, True)
        toks = []
        for tok in raw_tokens(text):
            r = mapped([tok])
            toks.append(r[0] if r else None)
        words = []
        for w in raw_tokens(query):
            r = mapped([w])
            if not r:
                return None
            words.append(r[0])
    terms = sorted(set(words))
    if not terms:
        return None
    pos = {t: [i for i, x in enumerate(toks) if x == t] for t in terms}
    if any(not pos[t] for t in terms):
        return None
    best = min(max(c) - min(c) for c in
               itertools.product(*[pos[t] for t in terms]))
    return best if best <= k else None


NEAR_QUERIES = [("state art", 1), ("state art", 0), ("a b", 2),
                ("the search", 3), ("state of art", 4),
                ("search engines state", 30), ("missing words", 9),
                ("search", 0), ("", 5)]


@pytest.mark.parametrize("mode", ["engine", "sql"])
def test_near_matches_brute_force(spark, sidecars, mode):
    from rechercheinfoweb_spark.operators.positions import near_search

    for query, k in NEAR_QUERIES:
        got = {r["doc_id"]: r["min_span"] for r in
               near_search(spark, sidecars[mode], query, k).collect()}
        exp = {}
        for did, text in DOCS:
            s = brute_near(text, query, mode, k)
            if s is not None:
                exp[did] = s
        assert got == exp, f"{mode}: NEAR/{k} {query!r}"


@pytest.mark.parametrize("seed", [11, 12])
def test_near_random_corpus_matches_brute(spark, tmp_path_factory,
                                          seed):
    """Seeded random corpora stress the vectorized NEAR kernel's
    multi-doc segment logic (ragged gather, per-doc segment resets,
    reduceat minima) — many docs per (bucket, salt) kernel call,
    including zero-token and single-term docs."""
    import random

    from rechercheinfoweb_spark.operators.positions import near_search
    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = [(i, " ".join(rng.choices(vocab, k=rng.randint(0, 40))))
            for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    d = str(tmp_path_factory.mktemp(f"pos_rand{seed}"))
    build_positions(spark, df, d, n_buckets=4, n_salts=3,
                    tokenizer="sql")
    for query, k in [("alpha beta", 3), ("gamma delta epsilon", 12),
                     ("alpha beta gamma delta", 25), ("zeta", 0)]:
        got = {r["doc_id"]: r["min_span"] for r in
               near_search(spark, d, query, k).collect()}
        exp = {}
        for did, text in docs:
            s = brute_near(text, query, "sql", k)
            if s is not None:
                exp[did] = s
        assert got == exp, (seed, query, k)
