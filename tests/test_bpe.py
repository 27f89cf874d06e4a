"""BPE trainer/encoder vs a pure-Python reference implementation.

The twin retrains from scratch (word counts → weighted pair counts →
deterministic argmax → left-to-right non-overlapping merge) and
re-encodes with the classic lowest-rank-pair loop, pinning both the
learned merge LIST (order matters) and the per-doc piece counts.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from rechercheinfoweb_spark.operators import bpe


def _toks(t):
    return [w.lower() for w in re.split(r"[^a-zA-Z0-9]+", t) if w]


def _train_brute(rows, n_merges, min_count=1, min_pair_count=2):
    wc = Counter(w for _d, t in rows for w in _toks(t))
    wc = {w: c for w, c in wc.items() if c >= min_count}
    syms = {w: tuple(list(w) + [bpe.END_MARK]) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, c in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _n = best
        merges.append((a, b))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if (i + 1 < len(s) and s[i] == a and s[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    return merges


BPE_ROWS = [
    (1, "low lower lowest low low slower"),
    (2, "new newer newest news new new"),
    (3, "the lowest newest widest low new"),
    (4, "wide wider widest low lower"),
    (5, ""),
    (6, "low-lower, LOWEST!  new?"),  # punctuation splits, case folds
]


@pytest.mark.parametrize("k,mc", [(8, 2), (20, 1)])
def test_train_bpe_matches_brute(spark, k, mc):
    docs = spark.createDataFrame(BPE_ROWS, "doc_id long, text string")
    got = bpe.train_bpe(docs, n_merges=k, min_pair_count=mc)
    want = _train_brute(BPE_ROWS, k, min_pair_count=mc)
    assert got == want
    assert len(got) > 0


def test_bpe_piece_counts_match_brute(spark):
    docs = spark.createDataFrame(BPE_ROWS, "doc_id long, text string")
    merges = bpe.train_bpe(docs, n_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    got = {r["doc_id"]: (r["n_words"], r["n_pieces"])
           for r in bpe.bpe_piece_counts(docs, merges).collect()}
    want = {}
    for d, t in BPE_ROWS:
        ts = _toks(t)
        want[d] = (len(ts), sum(
            len(bpe._encode_word(w, ranks)) for w in ts))
    assert got == want
    assert got[5] == (0, 0)
    # merged words take fewer pieces than raw chars+mark
    raw = {d: sum(len(w) + 1 for w in _toks(t)) for d, t in BPE_ROWS}
    assert got[1][1] < raw[1]


def test_bpe_encode_unseen_word_backs_off_to_chars(spark):
    docs = spark.createDataFrame(BPE_ROWS, "doc_id long, text string")
    merges = bpe.train_bpe(docs, n_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    # a word sharing no learned merge falls back to chars + mark,
    # partially-covered words merge their known prefixes only
    assert bpe._encode_word("zzq", ranks) == ["z", "z", "q",
                                              bpe.END_MARK]


def test_train_bpe_partitioning_invariant(spark):
    docs = spark.createDataFrame(BPE_ROWS, "doc_id long, text string")
    a = bpe.train_bpe(docs, n_merges=6)
    b = bpe.train_bpe(docs.repartition(7), n_merges=6)
    assert a == b
