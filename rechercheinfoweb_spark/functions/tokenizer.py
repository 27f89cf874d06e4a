"""Tokenizer kernel — the engine's single text-analysis spec.

Reference semantics (cited into /root/reference):
  * token charset: maximal runs of unicode letter/digit plus ' - /
    (lexer.go:7-9 ``tokenMember``; consumed by cacm.go:106-121)
  * index-time filter: drop token if len < 3 or in the stopword set
    (cacm.go:125-131,141-144)
  * stem with Porter2 iff len > 3, NO lowercasing anywhere
    (document.go:61-64)
  * raw token count per doc counts every charset token pre-filter
    (document.go:83-85) — Heaps-law input.

Query-side variants (the reference is deliberately asymmetric, see
SURVEY.md §7):
  * vector queries: split keeps only letters+digits
    (vector_query.go:14-16), stopwords filtered on the RAW unstemmed
    word (vector_query.go:60-62), then stem len>3.
  * boolean queries: same splitter, NO stopword filter
    (bool_query.go:52-58,180).

Everything here is plain Python on strings so the Spark pandas_udf
wrappers (functions/kernels.py), the pure-Python oracle, and the
golden-token fixtures share one implementation.  The Spark-side hot
path vectorizes over Arrow batches; per-token work is memoized via the
stemmer's lru_cache (Zipf vocabularies make the hit rate ~100%).
"""

from __future__ import annotations

import re

from .porter2 import stem

# Go unicode.IsLetter/IsDigit ≈ Python \w minus underscore (category
# L* + Nd plus Python's extras); plus the reference's ' - / extras.
TOKEN_RE = re.compile(r"(?:[^\W_]|['\-/])+")
# Query splitter (T2): letters+digits only — narrower than TOKEN_RE.
QUERY_TOKEN_RE = re.compile(r"[^\W_]+")

MIN_TOKEN_LEN = 3          # index-time: keep len >= 3  (cacm.go:141)
STEM_MIN_LEN = 4           # stem iff len > 3           (document.go:61)

# Deterministic stopword list (CACM ships 429 common words,
# main.go:34-45; we freeze a compact English function-word list —
# the engine treats it as data, injectable per corpus).
STOPWORDS = frozenset((
    "the", "of", "and", "a", "to", "in", "is", "you", "that", "it",
    "he", "was", "for", "on", "are", "as", "with", "his", "they",
    "at", "be", "this", "have", "from", "or", "one", "had", "by",
    "word", "but", "not", "what", "all", "were", "we", "when",
    "your", "can", "said", "there", "use", "an", "each", "which",
    "she", "do", "how", "their", "if", "will", "up", "other",
    "about", "out", "many", "then", "them", "these", "so", "some",
    "her", "would", "make", "like", "him", "into", "time", "has",
    "look", "two", "more", "write", "go", "see", "number", "no",
    "way", "could", "people", "my", "than", "first", "been", "who",
    "its", "now", "find", "long", "down", "day", "did", "get",
    "come", "made", "may", "part",
))


# ASCII fast path for the T1 split: within ASCII the token charset
# is exactly [A-Za-z0-9'-/], so translating every other ASCII char
# to a space and splitting on whitespace yields IDENTICAL tokens to
# TOKEN_RE.findall (str.translate+split run ~14x faster than the
# regex — tokenization is the build's hottest op, matching the
# reference's flamegraph, templates/perf.html:38-44).  Non-ASCII
# text (where Python's \w unicode classes decide) falls back to the
# regex; tests pin both paths against each other.
_ASCII_KEEP = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    "0123456789'-/")
_ASCII_SPLIT = str.maketrans(
    {i: " " for i in range(128) if chr(i) not in _ASCII_KEEP})


def raw_tokens(text: str) -> list[str]:
    """Charset tokens, pre-filter (T1). Heaps-law counts use len()."""
    if text.isascii():
        return text.translate(_ASCII_SPLIT).split()
    return TOKEN_RE.findall(text)


def index_tokens_from_raw(raw: list[str],
                          stopwords: frozenset[str] = STOPWORDS,
                          use_stem: bool = True) -> list[str]:
    """T4 len/stopword filter → T5 stem over pre-split charset tokens
    (the build kernels split once with TOKEN_RE and reuse the raw
    list for the Heaps count, so this is the shared back half).

    ``use_stem=False`` skips T5 — an engine configuration (recorded
    in corpus_stats) whose query pipeline is fully ANSI-SQL
    expressible, which the driver contract exploits to oracle-check
    the PHYSICAL engine path (packed index → shard kernel → WAND)
    against DuckDB directly."""
    out = []
    for tok in raw:
        if len(tok) < MIN_TOKEN_LEN or tok in stopwords:
            continue
        out.append(stem(tok) if use_stem and len(tok) >= STEM_MIN_LEN
                   else tok)
    return out


_MISS = object()


def make_index_token_mapper(stopwords: frozenset[str] = STOPWORDS,
                            use_stem: bool = True):
    """Memoized twin of :func:`index_tokens_from_raw` for the build
    kernels' hot loop: one dict probe per raw token instead of the
    len/stopword/stem call chain (Zipf vocabularies make the hit
    rate ~100%, so per-token cost collapses to a dict get).  The
    memo maps raw token → filtered/stemmed term or None (dropped);
    semantics are pinned by the golden-token and rank-identity
    tests, which run both paths."""
    memo: dict[str, str | None] = {}

    def mapped(raw: list[str]) -> list[str]:
        out = []
        append = out.append
        get = memo.get
        for tok in raw:
            r = get(tok, _MISS)
            if r is _MISS:
                if len(tok) < MIN_TOKEN_LEN or tok in stopwords:
                    r = None
                else:
                    r = (stem(tok) if use_stem
                         and len(tok) >= STEM_MIN_LEN else tok)
                memo[tok] = r
            if r is not None:
                append(r)
        return out

    return mapped


def index_tokens(text: str, stopwords: frozenset[str] = STOPWORDS,
                 use_stem: bool = True) -> list[str]:
    """Index-time pipeline: T1 charset → T4 len/stopword filter → T5 stem."""
    return index_tokens_from_raw(raw_tokens(text), stopwords,
                                 use_stem)


def vector_query_terms(
    query: str, stopwords: frozenset[str] = STOPWORDS,
    use_stem: bool = True
) -> list[str]:
    """Vector-query pipeline (Q7 front half): T2 split → stopword on
    raw word → stem len>3.  Duplicates kept (they score twice,
    vector_query.go:33-35).  ``use_stem`` must match the index's
    corpus_stats ``stemmed`` flag (readers pass it through)."""
    out = []
    for tok in QUERY_TOKEN_RE.findall(query):
        if tok in stopwords:
            continue
        out.append(stem(tok) if use_stem and len(tok) >= STEM_MIN_LEN
                   else tok)
    return out


def bool_query_term(word: str, use_stem: bool = True) -> str:
    """Boolean-query term normalization: stem len>3, no stopwording
    (bool_query.go:52-58)."""
    return (stem(word) if use_stem and len(word) >= STEM_MIN_LEN
            else word)
