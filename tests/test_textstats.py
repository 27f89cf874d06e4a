"""Repetition features and n-gram decontamination vs brute-force
Python oracles (the DuckDB contract queries check the same semantics
at sf0.01; here the inputs are crafted to trip every branch —
multi-line duplicates, degenerate one-token docs, empty text)."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from rechercheinfoweb_spark.operators import pipeline, textstats

DOCS = [
    # duplicated lines (one twice, one thrice) + repeated bigram
    (0, "spam ham\nspam ham\neggs and eggs and eggs\nzz\nzz\nzz"),
    # all lines unique, no repeated bigram
    (1, "alpha beta\ngamma delta\nepsilon zeta"),
    # single line, heavy bigram repetition ("go go" x many)
    (2, "go go go go go go go go"),
    # degenerate: one token (no bigrams), empty after trim lines
    (3, "word"),
    (4, ""),
    (5, "   \n   \n  "),
    # case folding: bigrams are lowercased
    (6, "Big CAT big cat BIG CAT"),
]


def _py_tokens(text):
    return [t.lower() for t in re.split(r"[^a-zA-Z0-9]+", text) if t]


def _py_repetition(text):
    lines = [l.strip() for l in text.split("\n")]
    lines = [l for l in lines if l]
    n_lines = len(lines)
    cnt = Counter(lines)
    n_distinct = len(cnt)
    dup_chars = sum(c * len(l) for l, c in cnt.items() if c >= 2)
    total_chars = sum(len(l) for l in lines)
    toks = _py_tokens(text)
    bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    n_bg = len(bigrams)
    top_bg = max(Counter(bigrams).values()) if bigrams else 0
    r = lambda num, den: round(num / max(den, 1), 6)  # noqa: E731
    return (n_lines, r(n_lines - n_distinct, n_lines),
            r(dup_chars, total_chars), n_bg, r(top_bg, n_bg))


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_repetition_stats_vs_python(spark, docs_df):
    got = {r["doc_id"]: (r["n_lines"], r["dup_line_frac"],
                         r["dup_line_char_frac"], r["n_bigrams"],
                         r["top_bigram_frac"])
           for r in textstats.repetition_stats(docs_df).collect()}
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        exp = _py_repetition(text)
        assert got[doc_id] == pytest.approx(exp), (doc_id, text)


def test_repetition_known_values(spark, docs_df):
    rows = {r["doc_id"]: r
            for r in textstats.repetition_stats(docs_df).collect()}
    # doc 0: 6 lines, 2 distinct dup groups (2x "spam ham", 3x "zz")
    assert rows[0]["n_lines"] == 6
    assert rows[0]["dup_line_frac"] == pytest.approx(3 / 6, abs=1e-6)
    # doc 2: "go go" appears 7 times out of 7 bigrams
    assert rows[2]["n_bigrams"] == 7
    assert rows[2]["top_bigram_frac"] == 1.0
    # doc 6: lowercased "big cat" x3 of 5 bigrams
    assert rows[6]["top_bigram_frac"] == pytest.approx(0.6, abs=1e-6)
    # degenerate docs: all-zero features, still present
    for d in (3, 4, 5):
        assert rows[d]["n_bigrams"] == 0
        assert rows[d]["top_bigram_frac"] == 0.0


def _py_ngrams(text, n):
    toks = _py_tokens(text)
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


TRAIN = [
    (10, "the quick brown fox jumps over the lazy dog"),
    (11, "a completely different sentence with no overlap at all"),
    (12, "quick brown fox said hello"),          # shares 1 trigram
    (13, "the quick brown fox jumps THE QUICK BROWN fox"),  # 2 grams
    (14, "xx"),                                   # too short for grams
]
BENCH = [
    (90, "the quick brown fox jumps far away"),
]


def test_contamination_vs_python(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    got = {r["doc_id"]: r["n_hits"]
           for r in pipeline.contamination(train, bench, n=3).collect()}
    bench_grams = set()
    for _d, t in BENCH:
        bench_grams |= _py_ngrams(t, 3)
    exp = {}
    for d, t in TRAIN:
        hits = len(_py_ngrams(t, 3) & bench_grams)
        if hits:
            exp[d] = hits
    assert got == exp
    assert 10 in got and 12 in got and 11 not in got and 14 not in got


def test_decontaminate_survivors(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  pipeline.decontaminate(train, bench, n=3).collect())
    assert kept == [11, 14]
    # min_hits above every doc's overlap keeps everything
    all_kept = sorted(r["doc_id"] for r in pipeline.decontaminate(
        train, bench, n=3, min_hits=99).collect())
    assert all_kept == [d for d, _ in TRAIN]


PII_DOCS = [
    (0, "contact me at alice.smith+spam@sub.example.co.uk today"),
    (1, "server 10.0.255.3 and 192.168.1.1 rebooted; call +14155550123"),
    (2, "no pii here at all"),
    (3, "a@b.io x 1.2.3.4 y +1234567 z a@b.io"),  # two emails
    (4, ""),
]


def test_scrub_pii_counts_and_text(spark):
    df = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r
            for r in textstats.scrub_pii(df).collect()}
    assert rows[0]["n_emails"] == 1 and "<EMAIL>" in rows[0]["scrubbed_text"]
    assert "alice" not in rows[0]["scrubbed_text"]
    assert rows[1]["n_ips"] == 2 and rows[1]["n_phones"] == 1
    assert rows[1]["scrubbed_text"].count("<IP>") == 2
    assert "<PHONE>" in rows[1]["scrubbed_text"]
    assert rows[2]["scrubbed_text"] == "no pii here at all"
    assert rows[3]["n_emails"] == 2 and rows[3]["n_ips"] == 1
    assert rows[3]["n_phones"] == 1
    assert rows[4]["n_emails"] == rows[4]["n_ips"] == 0


def test_scrub_pii_java_re2_agree(spark):
    """The patterns are RE2-compatible by construction; pin that
    Spark's Java regex and DuckDB's RE2 scrub crafted PII docs to
    IDENTICAL outputs (the sf corpus has no PII, so the contract
    query alone only proves the zero path)."""
    import duckdb

    from rechercheinfoweb_spark.operators.textstats import (
        PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE, scrub_pii,
    )
    df = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    got = sorted(map(tuple, scrub_pii(df).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", PII_DOCS)
    exp = sorted(con.execute(f"""
        WITH s1 AS (SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}'))
                   AS BIGINT) AS n_emails,
               regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g')
                   AS t1 FROM d),
        s2 AS (SELECT doc_id, n_emails,
               CAST(len(regexp_extract_all(t1, '{PII_IPV4_RE}'))
                   AS BIGINT) AS n_ips,
               regexp_replace(t1, '{PII_IPV4_RE}', '<IP>', 'g') AS t2
               FROM s1)
        SELECT doc_id, n_emails, n_ips,
               CAST(len(regexp_extract_all(t2, '{PII_PHONE_RE}'))
                   AS BIGINT) AS n_phones,
               regexp_replace(t2, '{PII_PHONE_RE}', '<PHONE>', 'g')
        FROM s2""").fetchall())
    assert got == exp


def test_source_mix(spark):
    from rechercheinfoweb_spark.operators.textstats import source_mix
    df = spark.createDataFrame(
        [(0, "a b c", "web"), (1, "dd ee", "web"), (2, "f", "book")],
        "doc_id long, text string, source string")
    rows = {r["source"]: r for r in source_mix(df).collect()}
    assert rows["web"]["n_docs"] == 2
    assert rows["web"]["n_tokens"] == 5
    assert rows["web"]["n_chars"] == 10
    assert rows["book"]["n_tokens"] == 1


def test_decontaminate_plan_broadcasts_benchmark(spark):
    """The benchmark gram table must be the broadcast side — the
    training corpus is never shuffled on gram strings."""
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    plan = pipeline.contamination(train, bench, n=3)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---- Unicode normalization -------------------------------------------


def test_normalize_text_nfc(spark):
    """NFC kernel == unicodedata == DuckDB nfc_normalize (cross-
    engine pin on composed/decomposed/ligature/ASCII cases)."""
    import unicodedata

    rows = [
        (1, "cafe\u0301 composed"),      # decomposed e+acute
        (2, "caf\u00e9 already"),        # NFC fixed point
        (3, "plain ascii only"),
        (4, "\ufb01rst ligature stays"),  # NFC keeps U+FB01
        (5, ""),
        (6, "\u00c5 ring + \u212b angstrom"),  # both -> U+00C5
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_norm"], r["changed"])
           for r in textstats.normalize_text(docs).collect()}
    for d, t in rows:
        want = unicodedata.normalize("NFC", t)
        assert got[d] == (want, int(want != t)), d
    assert got[1] == ("caf\u00e9 composed", 1)
    assert got[4][1] == 0   # ligature untouched under NFC
    assert got[6][1] == 1   # angstrom sign folded to ring A

    import duckdb
    for d, t in rows:
        if t.isascii():
            continue
        assert duckdb.execute(
            "SELECT nfc_normalize(?)", [t]).fetchone()[0] \
            == got[d][0], d

    # NFKC additionally folds compatibility forms
    nk = {r["doc_id"]: r["text_norm"] for r in
          textstats.normalize_text(docs, form="NFKC").collect()}
    assert nk[4].startswith("first")


def test_lang_id_zero_shuffle_and_empty_doc(spark):
    """lang_id is one map-side projection (no Exchange — the old
    explode+groupBy shuffled every corpus token), and an empty doc
    now gets a row voting 'und' instead of silently vanishing."""
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, ""), (3, "der die das")],
        "doc_id long, text string")
    plan = textstats.lang_id(docs)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = {r["doc_id"]: r["lang_pred"]
            for r in textstats.lang_id(docs).collect()}
    assert rows == {1: "en", 2: "und", 3: "de"}
