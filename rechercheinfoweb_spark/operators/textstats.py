"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

These run over a ``documents``-shaped table (doc_id, text, ...) and
are deliberately expressed with JVM-side built-ins
(split/explode/md5/regexp_count/...) so they stay inside whole-stage
codegen — no Python in the hot path.  Each has an ANSI-SQL oracle in
``__spark_entry__.oracle_sql`` (DuckDB), which is why the simple
queries use the SQL-portable tokenizer ``SQL_TOKEN_SPLIT`` (split on
non-alphanumeric) rather than the engine's stemmed tokenizer — the
stemmed pipeline is validated separately against the pure-Python
oracle (tests/test_query_vector.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# SQL-portable tokenizer: identical semantics in Spark and DuckDB.
SQL_TOKEN_SPLIT = "[^a-zA-Z0-9]+"

# Deterministic per-language marker words (language ID is a plain
# marker-vote heuristic — fully SQL-expressible, no model).
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "es": ("el", "la", "los", "que", "de", "en", "es", "con"),
    "fr": ("le", "la", "les", "et", "est", "dans", "pour", "que"),
}


def tokens_col(col: str = "text") -> Column:
    """Array of SQL-portable tokens (empty strings filtered)."""
    return F.filter(F.split(F.col(col), SQL_TOKEN_SPLIT),
                    lambda t: t != "")


def lower_tokens_col(col: str = "text") -> Column:
    """Lowercased SQL-portable token array."""
    return F.transform(tokens_col(col), lambda t: F.lower(t))


def ngrams_of_tokens(toks: Column, n: int) -> Column:
    """Token *n*-grams (space-joined) of an ALREADY-MATERIALIZED
    token-array column.  Callers should project the token array in a
    separate select first: referencing ``lower_tokens_col`` directly
    here would inline the tokenizer 3x into one expression (size
    bound, sequence bound, slice source) — Catalyst does not
    common-subexpression-eliminate inside a Generate, so the corpus
    would tokenize three times per scan."""
    sz = F.size(toks)
    return F.when(sz >= n, F.transform(
        F.sequence(F.lit(1), sz - n + 1),
        lambda i: F.array_join(F.slice(toks, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def ngrams_col(n: int, col: str = "text") -> Column:
    """Lowercased token *n*-grams of *col* joined by single spaces
    (SQL-portable tokenizer, so the DuckDB oracle can recompute
    them).  Shared by decontamination (operators/pipeline.py) and
    duplicated-span detection (operators/dedup.py).  Prefer the
    two-step project + :func:`ngrams_of_tokens` form on hot paths
    (see its docstring)."""
    return ngrams_of_tokens(lower_tokens_col(col), n)


# Explicit whitespace class instead of \s: Java's \s includes
# vertical tab (\x0B) but RE2's does not, so \s is NOT portable
# between Spark and the DuckDB oracle.  The escape forms \t \n \f \r
# mean the same thing in both dialects.
WS_SPLIT_RE = r"[ \t\n\f\r]+"

# BPE-ish pre-tokenizer (GPT-2-style segmentation, ASCII classes
# only so Spark's Java regex and DuckDB's RE2 agree): an optional
# leading space glued to a letter-run / digit-run / punct-run, or a
# whitespace run.  Counting these segments approximates BPE token
# counts the way training-data pipelines budget documents.
BPE_SPLIT_RE = (r" ?[A-Za-z]+| ?[0-9]+"
                r"| ?[^A-Za-z0-9 \t\n\f\r]+|[ \t\n\f\r]+")


def token_counts(docs: DataFrame) -> DataFrame:
    """Per-doc token counts: whitespace words + alnum tokens +
    BPE-ish pre-tokenizer segments + chars."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), WS_SPLIT_RE))
         .alias("ws_tokens"),
        F.size(tokens_col()).alias("alnum_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_SPLIT_RE),
                                    F.lit(0))).alias("bpe_tokens"),
        F.length("text").alias("n_chars"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word vote per language; winner by count then language
    code (deterministic).

    Zero-shuffle since r4: the per-language hit counts are array
    filters over ONE projected lowercased-token array (the previous
    explode + groupBy(doc_id) shuffled every token of the corpus —
    a non-shape at 10^12 docs for a per-row statistic).  Counts
    stay LONG like the old sum aggregate.  One DELIBERATE row-count
    change vs the explode path (pinned in tests): docs with zero
    tokens (empty/punctuation-only text) now get a row with
    lang_pred='und' where explode dropped them — a per-row
    statistic should cover every row."""
    base = docs.select(
        "doc_id",
        F.transform(tokens_col(), lambda t: F.lower(t))
        .alias("_lt"))
    lt = F.col("_lt")
    langs = list(LANG_MARKERS)
    counted = base.select("doc_id", *[
        F.size(F.filter(lt, lambda t: t.isin(*words)))
        .cast("long").alias(f"hits_{lang}")
        for lang, words in LANG_MARKERS.items()])
    best = F.greatest(*[F.col(f"hits_{la}") for la in langs])
    pick = F.coalesce(
        *[F.when((F.col(f"hits_{la}") == best) & (best > 0), F.lit(la))
          for la in langs],
        F.lit("und"))
    return counted.select("doc_id", *[f"hits_{la}" for la in langs],
                          pick.alias("lang_pred"))


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + composite score (rounded so the
    DuckDB oracle hashes identically).

    Three chained projections so the tokenize, the stopword filter
    and the alpha strip each run ONCE per row — the ratio and score
    outputs then combine cheap integer columns (inlining the trees
    re-evaluates them per reference; interpreted higher-order exprs
    get no CSE)."""
    base = docs.select("doc_id", "text", tokens_col().alias("_toks"))
    toks = F.col("_toks")
    counted = base.select(
        "doc_id",
        F.size(toks).alias("_n_tok"),
        F.length("text").alias("_n_chars"),
        F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
         .alias("_n_alpha"),
        F.size(F.filter(
            toks, lambda t: F.lower(t).isin(*LANG_MARKERS["en"])))
         .alias("_n_stop"))
    n_tok, n_chars = F.col("_n_tok"), F.col("_n_chars")
    n_alpha, n_stop = F.col("_n_alpha"), F.col("_n_stop")
    alpha_ratio = F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6)
    avg_tok_len = F.round(
        n_alpha / F.greatest(n_tok, F.lit(1)), 6)
    score = F.round(
        0.4 * alpha_ratio + 0.4 * stop_ratio
        + 0.2 * F.least(n_tok / F.lit(100.0), F.lit(1.0)), 6)
    return counted.select(
        "doc_id", n_tok.alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stopword_ratio"),
        avg_tok_len.alias("avg_token_len"),
        score.alias("quality"),
    )


# Winnowing (MOSS-style) fingerprint parameters: k-gram length in
# codepoints, window of consecutive k-gram hashes, polynomial base,
# prime modulus (2^31-1 keeps every intermediate in BIGINT range so
# the DuckDB oracle can mirror the arithmetic exactly).
WINNOW_K = 8
WINNOW_W = 4
WINNOW_B = 257
WINNOW_M = (1 << 31) - 1


def _winnow_kernel(k: int, w: int):
    """mapInPandas: (doc_id, text) → exploded (doc_id, fp) winnowing
    fingerprints.

    Rabin-Karp polynomial hash over Unicode codepoints, computed for
    ALL positions at once with k vectorized Horner passes
    (h = h·B + c, mod M) — O(k·n) numpy ops, no per-char Python.
    Winnowing then takes the min hash of every w-length window
    (sliding_window_view) and emits the DISTINCT minima: a ~1/w
    density sample of the k-gram hash stream that is position-stable
    under local edits (Schleimer et al., SIGMOD'03)."""
    def fn(batches):
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view
        import numpy as np
        B, M = np.uint64(WINNOW_B), np.uint64(WINNOW_M)
        for pdf in batches:
            ids: list = []
            fps: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                codes = np.frombuffer(
                    (text or "").encode("utf-32-le"),
                    dtype=np.uint32).astype(np.uint64)
                n = int(codes.size) - k + 1
                if n < w:  # no full window of k-gram hashes
                    continue
                h = np.zeros(n, dtype=np.uint64)
                for j in range(k):
                    h = (h * B + codes[j:j + n]) % M
                mins = sliding_window_view(h, w).min(axis=1)
                u = np.unique(mins).astype(np.int64)
                ids.extend([doc_id] * len(u))
                fps.extend(u.tolist())
            yield pd.DataFrame({"doc_id": ids, "fp": fps})
    return fn


def winnow_fingerprints(docs: DataFrame, k: int = WINNOW_K,
                        w: int = WINNOW_W) -> DataFrame:
    """Distinct winnowing fingerprints per doc: (doc_id, fp).

    The rolling-hash fingerprint family the training-data brief
    names: robust to local edits (a change touches only the ~k+w
    windows it overlaps), ~|text|/w fingerprints per doc.  Docs
    shorter than k+w-1 codepoints emit nothing."""
    return docs.select("doc_id", "text").mapInPandas(
        _winnow_kernel(k, w), schema="doc_id long, fp long")


def _scan_sorted_runs(arr: Column, run_value, combine=None) -> Column:
    """One map-side pass over ``array_sort(arr)`` tracking equal-
    element runs: folds with state (prev, run, acc); every time a run
    closes (and once more at the end) the accumulator becomes
    ``combine(acc, run_value(prev, run))`` — ``combine`` defaults to
    addition; pass ``F.greatest`` for a max-over-runs.  Zero shuffles
    — this is how the per-doc repetition features stay inside
    whole-stage codegen instead of paying an explode + two-level
    groupBy."""
    zero = F.lit(0).cast("long")
    if combine is None:
        combine = lambda a, b: a + b  # noqa: E731

    def close(acc):
        return combine(acc["acc"], run_value(acc["prev"], acc["run"]))

    def merge(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
             .alias("run"),
            F.when(same, acc["acc"]).otherwise(close(acc)).alias("acc"))

    init = F.struct(F.lit(None).cast("string").alias("prev"),
                    zero.alias("run"), zero.alias("acc"))
    return F.aggregate(F.array_sort(arr), init, merge, close)


def _lines_col(col: str = "text") -> Column:
    """Non-empty trimmed lines of *col* (split on \\n)."""
    return F.filter(
        F.transform(F.split(F.col(col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "")


def _bigrams_col(col: str = "text") -> Column:
    """Lowercased adjacent token bigrams ("tok1 tok2")."""
    toks = F.transform(tokens_col(col), lambda t: F.lower(t))
    n = F.size(toks)
    return F.when(n >= 2, F.zip_with(
        F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b))
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style per-doc repetition features (Rae et al. 2021
    §A1.1: "repetitious documents are low quality"): duplicate-line
    fraction, fraction of characters inside duplicated lines, and the
    fraction of token bigrams taken by the single most frequent
    bigram.  Training pipelines threshold these to drop boilerplate
    and degenerate (looping) text.

    Scale shape: every feature is a pure array expression over one
    row — a single corpus scan, zero shuffles, no Python.  The
    duplicate counts come from one sorted-run fold per array
    (:func:`_scan_sorted_runs`) instead of explode + groupBy(doc_id,
    item) + re-agg, which would shuffle the corpus twice.  The line
    and bigram arrays are projected once and shared across features
    (the no-CSE multi-reference pathology — see the Gopher gate
    note); the fraction outputs combine cheap integer columns."""
    base = docs.select("doc_id", _lines_col().alias("_lines"),
                       _bigrams_col().alias("_bg"))
    lines, bigrams = F.col("_lines"), F.col("_bg")
    zero = F.lit(0).cast("long")
    counted = base.select(
        "doc_id",
        F.size(lines).alias("_n_lines"),
        F.size(F.array_distinct(lines)).alias("_n_dist"),
        _scan_sorted_runs(
            lines, lambda prev, run: F.when(
                run >= 2, run * F.length(prev).cast("long"))
            .otherwise(zero)).alias("_dup_chars"),
        F.aggregate(lines, zero,
                    lambda acc, l: acc + F.length(l).cast("long"))
         .alias("_tot_chars"),
        F.size(bigrams).alias("_n_bg"),
        _scan_sorted_runs(bigrams, lambda _prev, run: run,
                          combine=F.greatest).alias("_top_bg"))

    def frac(num, den):
        return F.round(num / F.greatest(den, F.lit(1)), 6)

    n_lines = F.col("_n_lines")
    return counted.select(
        "doc_id",
        n_lines.alias("n_lines"),
        frac(n_lines - F.col("_n_dist"), n_lines)
        .alias("dup_line_frac"),
        frac(F.col("_dup_chars"), F.col("_tot_chars"))
        .alias("dup_line_char_frac"),
        F.col("_n_bg").alias("n_bigrams"),
        frac(F.col("_top_bg"), F.col("_n_bg"))
        .alias("top_bigram_frac"),
    )


# PII patterns — deliberately RE2-compatible (no lookaround, no
# backreferences) so Spark's Java regex and the DuckDB oracle's RE2
# match the same spans; ASCII classes only.  Production pipelines
# layer NER models on top; the regex tier is the always-on backstop.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b")
PII_PHONE_RE = r"\+[0-9]{7,15}\b"  # international +NNNNNNN form


def scrub_pii(docs: DataFrame) -> DataFrame:
    """Redact emails / IPv4s / international phone numbers with
    sentinel tokens and count the redactions per doc.

    One map-side projection (regexp_count + chained regexp_replace,
    whole-stage codegen) — at 100 TB this runs inside the same corpus
    scan as the quality gate, shuffling nothing.  Redaction order is
    fixed (email → ip → phone) so spans consumed by an earlier rule
    can't double-count in a later one."""
    email_n = F.regexp_count("text", F.lit(PII_EMAIL_RE))
    after_email = F.regexp_replace("text", PII_EMAIL_RE, "<EMAIL>")
    ip_n = F.regexp_count(after_email, F.lit(PII_IPV4_RE))
    after_ip = F.regexp_replace(after_email, F.lit(PII_IPV4_RE),
                                F.lit("<IP>"))
    phone_n = F.regexp_count(after_ip, F.lit(PII_PHONE_RE))
    scrubbed = F.regexp_replace(after_ip, F.lit(PII_PHONE_RE),
                                F.lit("<PHONE>"))
    return docs.select(
        "doc_id",
        email_n.cast("long").alias("n_emails"),
        ip_n.cast("long").alias("n_ips"),
        phone_n.cast("long").alias("n_phones"),
        scrubbed.alias("scrubbed_text"),
    )


def normalize_text(docs: DataFrame, form: str = "NFC") -> DataFrame:
    """Unicode normalization (crawl-ingest hygiene: mojibake-adjacent
    pages mix composed and decomposed accents, so every downstream
    hash/dedup/token op sees two spellings of the same text until
    this runs).  Returns (doc_id, text_norm, changed).

    Spark has no normalization built-in, so this is one Arrow-batched
    pandas UDF over the text column — map-side, no shuffle, and at
    100 TB it fuses into the same corpus scan as the other ingest
    gates.  A fast pre-check skips the Python normalizer for pure-
    ASCII batches (the overwhelming web-corpus case) since ASCII is
    a fixed point of every normalization form.  NFC is the default
    (content-preserving); NFKC also folds compatibility forms
    (ligatures, full-width) — more aggressive, flagged for tokenizer
    pipelines.  The DuckDB oracle recomputes NFC with its native
    ``nfc_normalize`` — a cross-engine pin of the normalization
    itself, which is stable across Unicode versions for assigned
    codepoints."""
    import unicodedata

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            if t.isascii():
                return t
            return unicodedata.normalize(form, t)
        return s.map(one)

    # project the UDF once, derive `changed` from the projected
    # column (inlining the expression twice would run the UDF twice
    # — Catalyst does not CSE Python UDF calls)
    staged = docs.select("doc_id", "text",
                         _norm(F.col("text")).alias("text_norm"))
    return staged.select(
        "doc_id", "text_norm",
        (F.col("text_norm") != F.col("text")).cast("int")
        .alias("changed"))


def source_mix(docs: DataFrame) -> DataFrame:
    """Per-source corpus mix: doc/token/char totals — the numbers a
    training run budgets its data mixture with.  One partial-agg
    shuffle keyed by source (map-side combine does the heavy
    lifting; source cardinality is tiny)."""
    return (docs
            .select("source", F.size(tokens_col()).alias("n_tok"),
                    F.length("text").alias("n_ch"))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.col("n_tok").cast("long")).alias("n_tokens"),
                 F.sum(F.col("n_ch").cast("long")).alias("n_chars")))


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic content fingerprint: md5 over the normalized
    (lowercased, single-space-joined) token stream — catches
    whitespace/punct-only mutations that exact md5(text) misses."""
    norm = F.lower(F.array_join(tokens_col(), " "))
    return docs.select(
        "doc_id",
        F.md5("text").alias("exact_md5"),
        F.md5(norm).alias("norm_fingerprint"),
    )


# ---- Gopher document-quality rules -----------------------------------
# Rae et al. 2021 (Gopher), Table A1 "quality filtering": the
# rule-based document gate every later pipeline (MassiveText,
# RefinedWeb, Dolma) reuses.  §A1.1's repetition half is
# :func:`repetition_stats`; this is the quality half.  All features
# are one map-side projection (regexp/array built-ins, zero
# shuffles), thresholds are the paper's published numbers.

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1       # '#' or ellipsis, each per word
GOPHER_MAX_BULLET_LINE_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2
# the paper's required-stopword list (>=2 must appear)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and",
                    "that", "have", "with")
ELLIPSIS_RE = r"(\.\.\.|…)"


def _gopher_features_from(col, words: Column, lines: Column,
                          toks: Column) -> dict[str, Column]:
    """The Gopher A1 features over EXPLICIT word/line/token array
    columns (floats pre-rounded to 6 — the gate thresholds compare
    the ROUNDED values, so stats, filter, and oracle agree
    bit-for-bit).  The gate operators project the three arrays ONCE
    and pass references; :func:`gopher_keep_col` passes the inline
    expressions for its single-Column streaming contract."""
    n_words = F.size(words).cast("long")
    wdiv = F.greatest(n_words, F.lit(1)).cast("double")
    # total word chars as one native concat+length — same integer
    # sum as a per-word fold, without the interpreted lambda
    mean_wl = F.round(
        F.length(F.array_join(words, "")).cast("long") / wdiv, 6)
    n_hash = (F.length(col)
              - F.length(F.replace(F.col(col) if isinstance(col, str)
                                   else col, F.lit("#"), F.lit(""))))
    n_ell = F.size(F.regexp_extract_all(col, F.lit(ELLIPSIS_RE), 0))
    ldiv = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet = F.size(F.filter(
        lines, lambda l: l.rlike(r"^[•\-\*]")))
    ell_end = F.size(F.filter(
        lines, lambda l: l.rlike(ELLIPSIS_RE + "$")))
    alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    # distinct required stopwords present — array_intersect touches
    # the token array ONCE (the old per-stopword array_contains fold
    # re-evaluated an inline toks expression 8x per row)
    stop_hits = F.size(F.array_intersect(
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        toks)).cast("long")
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "hash_ratio": F.round(n_hash / wdiv, 6),
        "ellipsis_ratio": F.round(n_ell / wdiv, 6),
        "bullet_line_frac": F.round(bullet / ldiv, 6),
        "ellipsis_line_frac": F.round(ell_end / ldiv, 6),
        "alpha_word_frac": F.round(alpha / wdiv, 6),
        "stop_hits": stop_hits,
    }


def _gopher_words_col(col: str = "text") -> Column:
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def _gopher_counts_kernel():
    """pandas UDF: raw TEXT → the nine integer numerators of the
    Gopher A1 gate, tokenized with Arrow C kernels (the three JVM
    splits — whitespace words, lines, tokens — dominated the gate's
    cost on page-sized docs):

      [n_words, word_chars, n_hash, n_ellipsis, n_lines, n_bullet,
       n_ellipsis_end, n_alpha_words, stop_hits]

    Ratios and round-6 stay JVM-side in the callers, so the gate's
    published feature values are bit-identical to the expression
    path (pinned by the keep-col equality test and the ts_gopher
    oracle).  RE2-vs-Java regex note: ``\\s`` differs only on
    ``\\x0B``, and the DuckDB oracle is RE2-based already."""
    import numpy as np

    @F.pandas_udf("array<long>")
    def kern(texts: pd.Series) -> pd.Series:
        import pyarrow as pa
        import pyarrow.compute as pc

        B = len(texts)
        out = np.zeros((B, 9), np.int64)
        if B == 0:
            return pd.Series([], dtype=object)
        arr = pa.array(texts.fillna(""), type=pa.string())

        words = pc.split_pattern_regex(arr, pattern=r"\s+")
        w_doc = np.repeat(np.arange(B),
                          np.diff(np.asarray(words.offsets)))
        w_lens = pc.utf8_length(words.values).to_numpy() \
            .astype(np.int64)
        w_ok = w_lens > 0
        out[:, 0] = np.bincount(w_doc[w_ok], minlength=B)
        out[:, 1] = np.bincount(w_doc[w_ok], weights=w_lens[w_ok],
                                minlength=B)
        alpha = pc.match_substring_regex(
            words.values, "[A-Za-z]").to_numpy(zero_copy_only=False)
        out[:, 7] = np.bincount(w_doc[w_ok & alpha], minlength=B)

        out[:, 2] = pc.count_substring(arr, "#").to_numpy() \
            .astype(np.int64)
        out[:, 3] = pc.count_substring_regex(
            arr, "(\\.\\.\\.|…)").to_numpy().astype(np.int64)

        lines = pc.split_pattern(arr, "\n")
        # Spark/DuckDB trim strips SPACES only — utf8_trim with an
        # explicit space set, not trim_whitespace (Unicode classes)
        l_vals = pc.utf8_trim(lines.values, characters=" ")
        l_doc = np.repeat(np.arange(B),
                          np.diff(np.asarray(lines.offsets)))
        l_ok = pc.utf8_length(l_vals).to_numpy() > 0
        out[:, 4] = np.bincount(l_doc[l_ok], minlength=B)
        bullet = pc.match_substring_regex(
            l_vals, "^[•\\-\\*]").to_numpy(zero_copy_only=False)
        out[:, 5] = np.bincount(l_doc[l_ok & bullet], minlength=B)
        ell_end = pc.match_substring_regex(
            l_vals, "(\\.\\.\\.|…)$").to_numpy(zero_copy_only=False)
        out[:, 6] = np.bincount(l_doc[l_ok & ell_end], minlength=B)

        toks = pc.split_pattern_regex(arr, pattern=SQL_TOKEN_SPLIT)
        tv = pc.ascii_lower(toks.values)
        t_doc = np.repeat(np.arange(B),
                          np.diff(np.asarray(toks.offsets)))
        hits = np.zeros(B, np.int64)
        for sw in GOPHER_STOPWORDS:
            m = pc.equal(tv, sw).to_numpy(zero_copy_only=False)
            present = np.zeros(B, bool)
            present[t_doc[m]] = True
            hits += present
        out[:, 8] = hits
        return pd.Series(list(out))

    return kern


def _gopher_features_from_counts() -> dict[str, Column]:
    """The A1 features over the counts-kernel column ``_c`` — the
    SAME ratio/round expressions as :func:`_gopher_features_from`,
    fed by Arrow-side integer numerators."""
    g = lambda i: F.element_at("_c", i)  # noqa: E731
    n_words = g(1).cast("long")
    wdiv = F.greatest(n_words, F.lit(1)).cast("double")
    ldiv = F.greatest(g(5), F.lit(1)).cast("double")
    return {
        "n_words": n_words,
        "mean_word_len": F.round(g(2).cast("long") / wdiv, 6),
        "hash_ratio": F.round(g(3).cast("long") / wdiv, 6),
        "ellipsis_ratio": F.round(g(4).cast("long") / wdiv, 6),
        "bullet_line_frac": F.round(g(6).cast("long") / ldiv, 6),
        "ellipsis_line_frac": F.round(g(7).cast("long") / ldiv, 6),
        "alpha_word_frac": F.round(g(8).cast("long") / wdiv, 6),
        "stop_hits": g(9).cast("long"),
    }


def _gopher_feature_cols(col: str = "text") -> dict[str, Column]:
    """Inline-expression variant (one self-contained Column per
    feature) — used by :func:`gopher_keep_col`, whose contract is a
    single composable boolean Column.  The gate OPERATORS use the
    shared-array projection instead: evaluating these inline trees
    once per feature re-splits/re-tokenizes the text several times
    per row (higher-order exprs run interpreted, no CSE — measured
    8x slower on page-sized docs)."""
    return _gopher_features_from(col, _gopher_words_col(col),
                                 _lines_col(col),
                                 lower_tokens_col(col))


def _gopher_keep_expr(f) -> Column:
    """The composite gate over a feature accessor (name -> Column) —
    shared by the stats table and the streamable predicate."""
    return ((f("n_words") >= GOPHER_MIN_WORDS)
            & (f("n_words") <= GOPHER_MAX_WORDS)
            & (f("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN)
            & (f("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN)
            & (f("hash_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
            & (f("ellipsis_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
            & (f("bullet_line_frac") <= GOPHER_MAX_BULLET_LINE_FRAC)
            & (f("ellipsis_line_frac")
               <= GOPHER_MAX_ELLIPSIS_LINE_FRAC)
            & (f("alpha_word_frac") >= GOPHER_MIN_ALPHA_WORD_FRAC)
            & (f("stop_hits") >= GOPHER_MIN_STOP_HITS))


def gopher_quality_stats(docs: DataFrame) -> DataFrame:
    """Per-doc Gopher A1 quality features + the composite ``keep``
    gate (1 = survives every rule):

      * ``n_words`` whitespace words; ``mean_word_len``
      * ``hash_ratio`` / ``ellipsis_ratio``: '#' chars and ellipsis
        occurrences ("..." or U+2026) per word
      * ``bullet_line_frac`` lines starting with a bullet (• - *)
      * ``ellipsis_line_frac`` lines ending in an ellipsis
      * ``alpha_word_frac`` words containing >=1 [A-Za-z]
      * ``stop_hits`` how many of the paper's 8 required stopwords
        appear as tokens

    Floats rounded to 6 (oracle convention); zero-word / zero-line
    docs get 0 features and fail the gate on the word-count rule.

    The nine integer numerators come from ONE Arrow counts kernel
    (:func:`_gopher_counts_kernel` — C-side splits; the three JVM
    split expressions dominated the gate at 15-20 s on the 50k
    page-doc corpus); ratios and round-6 stay JVM-side, so feature
    values are bit-identical to the expression path."""
    base = docs.select("doc_id",
                       _gopher_counts_kernel()("text").alias("_c"))
    feats = _gopher_features_from_counts()
    out = base.select("doc_id",
                      *[c.alias(n) for n, c in feats.items()])
    return out.withColumn("keep", _gopher_keep_expr(F.col).cast("int"))


def gopher_keep_col(col: str = "text") -> Column:
    """The Gopher gate as ONE boolean column expression — usable on
    any (batch or streaming) DataFrame with a text column; pinned
    equal to ``gopher_quality_stats``'s keep in tests.  Convenient
    for composing into an existing predicate, but the inline
    expression trees re-derive the arrays per feature — for a plain
    batch/streaming filter prefer :func:`gopher_filter`, which
    shares them."""
    feats = _gopher_feature_cols(col)
    return _gopher_keep_expr(lambda n: feats[n])


def gopher_filter(docs: DataFrame) -> DataFrame:
    """Docs surviving every Gopher A1 quality rule — map-side only
    (no join, no shuffle; works on streaming input too).  Same
    Arrow counts kernel as :func:`gopher_quality_stats`; the helper
    column is dropped after the gate, so the output schema is
    exactly the input schema."""
    cols = docs.columns
    base = docs.select(*cols,
                       _gopher_counts_kernel()("text").alias("_c"))
    feats = _gopher_features_from_counts()
    gated = base.select(*cols,
                        _gopher_keep_expr(lambda n: feats[n])
                        .alias("_keep"))
    return gated.where(F.col("_keep")).select(*cols)


# ---- Gopher A1.1 full repetition table -------------------------------
# :func:`repetition_stats` above carries the line-level features; this
# completes Rae et al. 2021 Table A1's repetition half: top n-gram
# character fractions (n = 2, 3, 4) and duplicate n-gram character
# fractions (n = 5..10), with the paper's thresholds as the composite
# ``rep_keep`` gate.  All features are per-doc array folds — one
# corpus scan, zero shuffles, no Python.

GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13,
                        8: 0.12, 9: 0.11, 10: 0.10}


def _tok_chars_col(toks: Column) -> Column:
    """Total characters across the token array (the denominator the
    n-gram fractions share — whitespace/punctuation never counted,
    so numerator and denominator measure the same alphabet)."""
    zero = F.lit(0).cast("long")
    return F.aggregate(toks, zero,
                       lambda a, t: a + F.length(t).cast("long"))


def _top_gram_chars_col(grams: Column, n: int) -> Column:
    """Characters covered by the MOST FREQUENT n-gram: count(top) ×
    token-chars(top).  Argmax by occurrence count with lexicographic
    tie-break, via one sorted-run fold (no explode/shuffle); the
    space-joined gram string carries n−1 separators, subtracted."""
    zero = F.lit(0).cast("long")

    def better(run, prev, acc):
        return (run > acc["bestr"]) | (
            (run == acc["bestr"])
            & (acc["bestg"].isNull() | (prev < acc["bestg"])))

    def close(acc):
        upd = acc["prev"].isNotNull() & better(acc["run"], acc["prev"],
                                               acc)
        bestr = F.when(upd, acc["run"]).otherwise(acc["bestr"])
        bestg = F.when(upd, acc["prev"]).otherwise(acc["bestg"])
        return F.when(
            bestg.isNotNull(),
            bestr * (F.length(bestg).cast("long") - F.lit(n - 1))
        ).otherwise(zero)

    def merge(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        closing = acc["prev"].isNotNull() & ~same
        upd = closing & better(acc["run"], acc["prev"], acc)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1)
             .otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(upd, acc["run"]).otherwise(acc["bestr"])
             .alias("bestr"),
            F.when(upd, acc["prev"]).otherwise(acc["bestg"])
             .alias("bestg"))

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"), zero.alias("bestr"),
        F.lit(None).cast("string").alias("bestg"))
    return F.aggregate(F.array_sort(grams), init, merge, close)


def _dup_set_col(grams: Column) -> Column:
    """Distinct grams occurring >= 2 times, as an array (one sorted
    fold: append a gram the moment its run reaches 2)."""

    def merge(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        run = F.when(same, acc["run"] + 1).otherwise(
            F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.when(same & (run == 2),
                   F.concat(acc["dups"], F.array(x)))
             .otherwise(acc["dups"]).alias("dups"))

    init = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).cast("long").alias("run"),
                    F.array().cast("array<string>").alias("dups"))
    return F.aggregate(F.array_sort(grams), init, merge,
                       lambda acc: acc["dups"])


def _dup_gram_cov_chars_col(toks: Column, grams: Column,
                            n: int) -> Column:
    """Characters of tokens covered by ANY duplicated n-gram
    occurrence — overlap-aware (each token counted once no matter
    how many duplicated grams span it; the Table-A1 footnote).
    Token t is covered iff some gram starting in
    [t−n+1, t] ∩ [1, G] is in the doc's duplicate set.

    Kept as the pure-Catalyst reference; O(G·|dups|) membership
    scans make it quadratic-ish on repetitive docs, so
    :func:`gopher_repetition_stats` uses the exact Arrow kernel
    (:func:`_dup_cov_kernel`) instead — this column remains for the
    equivalence test."""
    zero = F.lit(0).cast("long")
    dups = _dup_set_col(grams)
    g_cnt = F.size(grams)
    cov = F.aggregate(
        F.sequence(F.lit(1), F.size(toks)), zero,
        lambda acc, t: acc + F.when(
            F.exists(
                F.sequence(F.greatest(F.lit(1), t - F.lit(n - 1)),
                           F.least(t, g_cnt)),
                lambda i: F.array_contains(dups,
                                           F.element_at(grams, i))),
            F.length(F.element_at(toks, t)).cast("long")
        ).otherwise(zero))
    return F.when((g_cnt >= 1) & (F.size(dups) >= 1),
                  cov).otherwise(zero)


def _dup_cov_kernel(ns: tuple[int, ...]):
    """pandas UDF: token array → array of dup-n-gram coverage char
    counts, one per n in ``ns`` — EXACT (np.unique over sliding
    token-id windows, no hashing) and vectorized: per doc per n the
    work is one (G, n) unique + two prefix-sum passes, vs the
    Catalyst fold's O(G·|dups|·n) membership scans.  Returns raw
    LONG counts; the fraction division + rounding stay JVM-side so
    oracle rounding semantics are untouched."""
    import numpy as np

    @F.pandas_udf("array<long>")
    def kern(tok_arrays: pd.Series) -> pd.Series:
        from numpy.lib.stride_tricks import sliding_window_view

        def per(toks) -> list[int]:
            toks = list(toks)
            lens = np.array([len(t) for t in toks], dtype=np.int64)
            _u, ids = np.unique(toks, return_inverse=True) \
                if toks else (None, np.zeros(0, dtype=np.int64))
            out = []
            for n in ns:
                G = len(toks) - n + 1
                if G < 2:
                    out.append(0)
                    continue
                wins = sliding_window_view(ids, n)
                _ug, inv, cnt = np.unique(
                    wins, axis=0, return_inverse=True,
                    return_counts=True)
                starts = (cnt[inv] >= 2).astype(np.int64)
                if not starts.any():
                    out.append(0)
                    continue
                # token t covered iff a dup start lies in
                # [t-n+1, t] ∩ [0, G-1] — windowed any() via one
                # prefix sum over the start flags
                ps = np.concatenate(([0], np.cumsum(starts)))
                t = np.arange(len(toks))
                lo = np.maximum(t - n + 1, 0)
                hi = np.minimum(t, G - 1)
                covered = (hi >= lo) & (ps[hi + 1] - ps[lo] > 0)
                out.append(int(lens[covered].sum()))
            return out

        return tok_arrays.map(per)

    return kern


def _gopher_rep_kernel(top_ns: tuple[int, ...],
                       dup_ns: tuple[int, ...]):
    """pandas UDF: raw TEXT → [total token chars] + ALL A1.1
    repetition numerators in one pass — [top-n chars per n in
    ``top_ns``] + [dup-n coverage chars per n in ``dup_ns``], raw
    LONGs (fractions stay JVM-side).  Tokenization happens INSIDE
    the kernel with Arrow C kernels (RE2 split + ascii lower +
    dictionary encode) — semantically identical to
    ``lower_tokens_col`` and an order of magnitude cheaper than the
    JVM split expression on page-sized docs.

    EXACT and single-factorization: tokens are np.unique'd ONCE per
    doc; every longer gram id derives incrementally from the previous
    length's ids (gram_n(i) ≡ (gram_{n-1}(i), token(i+n-1)), pair-
    encoded into one int64 < T·V), so each n costs one 1-D integer
    unique + bincount instead of the former per-n row-wise
    np.unique(axis=0) over a (G, n) matrix or a JVM string-array
    sort.  Replaces six dup-n kernel passes plus three top-n sorted-
    run folds with ONE kernel call (the r3 bench's costliest per-doc
    kernel at 42.8 s / 24%% of total).

    Semantics pinned by the ts_gopher_rep DuckDB oracle and the
    brute-force pytest twin: top-n = count × token-chars of the most
    frequent n-gram, ties broken by the lexicographically smallest
    space-joined gram; dup-n = chars of tokens covered by any
    duplicated n-gram occurrence, overlap-aware."""
    import numpy as np

    all_ns = sorted(set(top_ns) | set(dup_ns))
    top_rows = {n: i for i, n in enumerate(top_ns)}
    dup_rows = {n: i for i, n in enumerate(dup_ns)}
    n_max = all_ns[-1]

    # Tie-break correctness of the integer path: the top-n argmax
    # breaks count ties by the lexicographically smallest SPACE-
    # JOINED gram.  Every tokenizer charset here is > 0x20 (alnum
    # plus '-/), so joined-string order equals token-tuple order
    # equals token-RANK-tuple order, and the incremental gram ids
    # below are assigned in exactly (doc, rank-tuple) order — the
    # smallest tied gram id IS the tie-break winner, no string joins.

    @F.pandas_udf("array<long>")
    def kern(texts: pd.Series) -> pd.Series:
        import pyarrow as pa
        import pyarrow.compute as pc

        B = len(texts)
        k = 1 + len(top_ns) + len(dup_ns)
        out = np.zeros((B, k), np.int64)
        if B == 0:
            return pd.Series([], dtype=object)
        # Arrow-native tokenize (RE2 split + ascii lower, all C) —
        # the JVM split expression measured 15-20 s alone on the 50k
        # page-doc corpus, dwarfing the gram math.  Tokens under
        # this split are pure [a-zA-Z0-9], so ascii_lower == the JVM
        # F.lower and split/lower order cannot matter; the boundary
        # empties RE2 emits are exactly the ones tokens_col filters.
        arr = pa.array(texts.fillna(""), type=pa.string())
        toks = pc.split_pattern_regex(arr, pattern=SQL_TOKEN_SPLIT)
        offs = np.asarray(toks.offsets).astype(np.int64)
        vals = pc.ascii_lower(toks.values)
        lens_all = pc.utf8_length(vals).to_numpy().astype(np.int64)
        doc_of_all = np.repeat(np.arange(B), np.diff(offs))
        nonempty = lens_all > 0
        dec = pc.dictionary_encode(vals)
        codes = np.asarray(dec.indices).astype(np.int64)[nonempty]
        uniq = np.asarray(dec.dictionary.to_pandas(), dtype=object)
        doc_of = doc_of_all[nonempty]
        tok_lens = lens_all[nonempty]
        T = int(codes.size)
        if T:
            n_i = np.bincount(doc_of, minlength=B).astype(np.int64)
            # element 1: total token chars (the shared denominator)
            out[:, 0] = np.bincount(
                doc_of, weights=tok_lens,
                minlength=B).astype(np.int64)
            # lexicographic RANKS over only the V distinct tokens
            # (the rank-tuple tie-break needs string order; V << T)
            order = np.argsort(uniq)
            rank = np.empty(len(uniq), np.int64)
            rank[order] = np.arange(len(uniq))
            ids = rank[codes]
            V = np.int64(len(uniq))
            cumlens = np.concatenate(([0], np.cumsum(tok_lens)))
            ends = np.cumsum(n_i)
            doc_start_flat = np.repeat(ends - n_i, n_i)
            doc_end_flat = np.repeat(ends, n_i)
            idx = np.arange(T)
            _, gid = np.unique(doc_of * V + ids,
                               return_inverse=True)
            gid = gid.astype(np.int64)
            for n in range(2, n_max + 1):
                valid = idx + (n - 1) < doc_end_flat
                vp = idx[valid]
                if vp.size == 0:
                    break
                keys = gid[vp] * V + ids[vp + n - 1]
                _uk, first, inv = np.unique(
                    keys, return_index=True, return_inverse=True)
                counts = np.bincount(inv)
                n_grams = len(_uk)
                gram_doc = doc_of[vp[first]]
                if n in top_rows:
                    maxc = np.zeros(B, np.int64)
                    np.maximum.at(maxc, gram_doc, counts)
                    cand = np.nonzero(counts == maxc[gram_doc])[0]
                    # min gram id per doc among tied == lex winner
                    bj = np.full(B, n_grams, np.int64)
                    np.minimum.at(bj, gram_doc[cand], cand)
                    have = np.nonzero(bj < n_grams)[0]
                    s = vp[first[bj[have]]]
                    chars = cumlens[s + n] - cumlens[s]
                    out[have, 1 + top_rows[n]] = maxc[have] * chars
                if n in dup_rows:
                    dup_start = np.zeros(T, np.int64)
                    dup_start[vp] = counts[inv] >= 2
                    if dup_start.any():
                        S = np.concatenate(
                            ([0], np.cumsum(dup_start)))
                        lo = np.maximum(idx - (n - 1),
                                        doc_start_flat)
                        hi = np.minimum(idx, doc_end_flat - n)
                        cov = (hi >= lo) & (S[hi + 1] - S[lo] > 0)
                        sums = np.bincount(
                            doc_of, weights=np.where(cov, tok_lens,
                                                     0),
                            minlength=B)
                        out[:, 1 + len(top_ns) + dup_rows[n]] = \
                            sums.astype(np.int64)
                nxt = np.full(T, -1, np.int64)
                nxt[vp] = inv
                gid = nxt
        return pd.Series(list(out))

    return kern


def _gopher_rep_fractions(rep_col: str = "_rep"):
    """Shared A1.1 fraction columns from the kernel's counts array:
    [(name, fraction_column, threshold)], with the round-6 oracle
    convention applied — the single definition both the stats table
    and the map-side filter derive from."""
    top_ns = tuple(GOPHER_TOP_NGRAM_MAX)
    den = F.greatest(F.element_at(rep_col, 1),
                     F.lit(1)).cast("double")
    out = []
    for idx, (n, mx) in enumerate(GOPHER_TOP_NGRAM_MAX.items()):
        c = F.round(
            F.element_at(rep_col, idx + 2).cast("long") / den, 6)
        out.append((f"top{n}gram_char_frac", c, mx))
    off = len(top_ns) + 1
    for idx, (n, mx) in enumerate(GOPHER_DUP_NGRAM_MAX.items()):
        c = F.round(
            F.element_at(rep_col, off + idx + 1).cast("long") / den,
            6)
        out.append((f"dup{n}gram_char_frac", c, mx))
    return out


def gopher_repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-doc Gopher A1.1 n-gram repetition features + composite
    ``rep_keep`` gate (1 = under every threshold):

      * ``top{2,3,4}gram_char_frac`` — chars of the most frequent
        n-gram (count × gram chars) over total token chars
      * ``dup{5..10}gram_char_frac`` — chars of tokens covered by
        any duplicated n-gram, overlap-aware

    Complements :func:`repetition_stats` (line-level features).
    One map-side projection: ALL nine numerators come from a single
    Arrow kernel pass (:func:`_gopher_rep_kernel` — pinned equal to
    the pure-Catalyst/first-kernel reference implementations in
    tests); fractions rounded to 6 JVM-side."""
    top_ns = tuple(GOPHER_TOP_NGRAM_MAX)
    dup_ns = tuple(GOPHER_DUP_NGRAM_MAX)
    kern = _gopher_rep_kernel(top_ns, dup_ns)
    # the kernel tokenizes Arrow-side and returns the total-token-
    # chars denominator as element 1 — no JVM tokenize at all
    toked = docs.select("doc_id", kern("text").alias("_rep"))
    fracs = _gopher_rep_fractions()
    out = toked.select("doc_id",
                       *[c.alias(name) for name, c, _ in fracs])
    keep = None
    for name, _, mx in fracs:
        cond = F.col(name) <= mx
        keep = cond if keep is None else (keep & cond)
    return out.withColumn("rep_keep", keep.cast("int"))


def gopher_repetition_filter(docs: DataFrame) -> DataFrame:
    """Docs under every A1.1 repetition threshold — map-side only
    (no join, no shuffle; works on streaming input too).  Same
    Arrow kernel + round-6 fraction columns as
    :func:`gopher_repetition_stats` (gate bit-identical by
    construction); the helper column is dropped after the gate so
    the output schema is exactly the input schema."""
    top_ns = tuple(GOPHER_TOP_NGRAM_MAX)
    dup_ns = tuple(GOPHER_DUP_NGRAM_MAX)
    kern = _gopher_rep_kernel(top_ns, dup_ns)
    cols = docs.columns
    base = docs.select(*cols, kern("text").alias("_rep"))
    keep = None
    for _, c, mx in _gopher_rep_fractions():
        cond = c <= mx
        keep = cond if keep is None else (keep & cond)
    return base.where(keep).select(*cols)
