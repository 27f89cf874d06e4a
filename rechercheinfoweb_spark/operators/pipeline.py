"""End-to-end training-data cleaning pipeline over a documents table.

Composes the per-operator building blocks (textstats, dedup) into the
canonical Common-Crawl-style corpus-cleaning sequence:

  1. language filter       (marker-vote language ID)
  2. quality threshold     (alpha/stopword/length composite)
  3. exact dedup           (md5 groups, keep min doc_id)
  4. near-dup dedup        (simhash pairs -> connected components ->
                            keep the canonical member per component)

Scale shape (the point of fusing this into one operator instead of a
notebook of joins): stages 1-2 are a SINGLE map-side projection — the
language vote and every quality feature are array-expression
built-ins over the same tokens array, so one corpus scan, zero
shuffles, whole-stage codegen (textstats.lang_id is the standalone
equivalent but pays an explode + aggregate shuffle; the fused column
version is pinned equal to it in tests/test_pipeline.py).  Stage 3 is
one shuffle on md5(text).  Stage 4 is the chunk-blocked simhash
self-join (dedup.simhash_near_pairs — bounded by pigeonhole blocking,
never quadratic) plus O(log diameter) label-propagation rounds over
only the docs that appear in a pair.  The survivor anti-joins carry
(doc_id) keys, not text, so nothing rewide ever shuffles the corpus
again.

No reference analog (rechercheInfoWeb indexes everything it scans) —
this is the LLM-pipeline surface the brief adds on top of SURVEY §2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import dedup_keep, simhash_near_pairs
from .textstats import (
    LANG_MARKERS, lower_tokens_col, ngrams_of_tokens, tokens_col,
)


def _lang_pred_col(toks: Column) -> Column:
    """Map-side language vote: identical semantics to
    textstats.lang_id (winner by marker-hit count, ties broken by
    LANG_MARKERS declaration order, 'und' when no marker hits) but as
    a pure array expression — no explode, no shuffle."""
    def marker_hits(words):
        # closure factory, NOT a default arg: a two-parameter lambda
        # would select F.filter's (element, index) form
        return F.size(F.filter(toks,
                               lambda t: F.lower(t).isin(*words)))

    hits = {la: marker_hits(words)
            for la, words in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    return F.coalesce(
        *[F.when((hits[la] == best) & (best > 0), F.lit(la))
          for la in LANG_MARKERS],
        F.lit("und"))


def _quality_col(toks: Column) -> Column:
    """Map-side composite quality score — textstats.quality_score's
    ``quality`` column verbatim (same rounding, so thresholds applied
    here and there agree)."""
    n_tok = F.size(toks)
    n_chars = F.length("text")
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    n_stop = F.size(F.filter(
        toks, lambda t: F.lower(t).isin(*LANG_MARKERS["en"])))
    alpha_ratio = F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6)
    return F.round(
        0.4 * alpha_ratio + 0.4 * stop_ratio
        + 0.2 * F.least(n_tok / F.lit(100.0), F.lit(1.0)), 6)


def contamination(docs: DataFrame, benchmark: DataFrame,
                  n: int = 8) -> DataFrame:
    """(doc_id, n_hits): how many DISTINCT benchmark token n-grams
    each training doc contains (docs with zero hits are absent).

    The standard eval-set decontamination check (GPT-3 appx. C /
    PaLM-style n-gram overlap): a training document sharing any
    n-gram with a benchmark document leaks the benchmark.  ``n=8`` by
    default; production text pipelines use 8-13.

    Scale shape: the benchmark side is an eval set — thousands of
    docs, MBs — so its distinct-gram table is broadcast; the corpus
    side is one map-side scan (array n-grams → array_distinct →
    explode) into a broadcast-hash semi-join, then one partial-agg
    shuffle keyed by doc_id for the counts.  The 100-TB corpus is
    never shuffled on gram strings."""
    # two-step project (tokens as a materialized column, then grams)
    # — inlining ngrams_col into the Generate would tokenize each row
    # 3x (textstats.ngrams_of_tokens docstring)
    bench_grams = (benchmark
                   .select(lower_tokens_col().alias("toks"))
                   .select(F.explode(
                       ngrams_of_tokens(F.col("toks"), n))
                       .alias("gram"))
                   .distinct())
    doc_grams = (docs
                 .select("doc_id", lower_tokens_col().alias("toks"))
                 .select("doc_id",
                         F.explode(F.array_distinct(
                             ngrams_of_tokens(F.col("toks"), n)))
                         .alias("gram")))
    return (doc_grams
            .join(F.broadcast(bench_grams), "gram")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_hits")))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  n: int = 8, min_hits: int = 1) -> DataFrame:
    """Training docs sharing fewer than ``min_hits`` distinct token
    n-grams with the benchmark set (the survivors).  Anti-join on
    doc_id keys only — the wide text column is never shuffled."""
    flagged = (contamination(docs, benchmark, n)
               .where(F.col("n_hits") >= min_hits))
    return docs.join(flagged, "doc_id", "left_anti")


def _doc_stats_counts_kernel():
    """pandas UDF: raw TEXT → the integer numerators of the fused
    lang/quality scan, tokenized with Arrow C kernels (the JVM split
    expression alone costs 15-20 s on a 50k page-doc corpus — same
    finding as the Gopher operators):

      [n_tok, n_chars, n_alpha] + [marker-hit count per language in
       LANG_MARKERS declaration order]

    The vote/ratio/round expressions stay JVM-side in
    :func:`_doc_stats_select`, so lang_pred and quality are
    bit-identical to the expression path (pinned by the
    doc_stats-vs-standalone test and the pp_clean oracle)."""
    import numpy as np

    from .textstats import SQL_TOKEN_SPLIT
    marker_sets = {la: list(ws) for la, ws in LANG_MARKERS.items()}

    @F.pandas_udf("array<long>")
    def kern(texts: pd.Series) -> pd.Series:
        import pyarrow as pa
        import pyarrow.compute as pc

        B = len(texts)
        out = np.zeros((B, 3 + len(marker_sets)), np.int64)
        if B == 0:
            return pd.Series([], dtype=object)
        # NULL text -> NULL counts (expression-path semantics: the
        # row then gets NULL lang_pred/quality and fails every gate
        # comparison, rather than masquerading as an empty doc)
        null_mask = texts.isna().to_numpy()
        arr = pa.array(texts.fillna(""), type=pa.string())
        toks = pc.split_pattern_regex(arr, pattern=SQL_TOKEN_SPLIT)
        tv = pc.ascii_lower(toks.values)
        t_doc = np.repeat(np.arange(B),
                          np.diff(np.asarray(toks.offsets)))
        nonempty = pc.utf8_length(toks.values).to_numpy() > 0
        out[:, 0] = np.bincount(t_doc[nonempty], minlength=B)
        out[:, 1] = pc.utf8_length(arr).to_numpy().astype(np.int64)
        out[:, 2] = pc.count_substring_regex(
            arr, "[a-zA-Z]").to_numpy().astype(np.int64)
        for j, (la, words) in enumerate(marker_sets.items()):
            m = pc.is_in(tv, value_set=pa.array(words)) \
                .to_numpy(zero_copy_only=False)
            out[:, 3 + j] = np.bincount(t_doc[m], minlength=B)
        return pd.Series([None if null_mask[i] else out[i]
                          for i in range(B)], dtype=object)

    return kern


def _quality_expr_from_counts() -> Column:
    """The composite quality score over the counts column ``_c`` —
    the SAME ratio/round expressions as :func:`_quality_col`."""
    g = lambda i: F.element_at("_c", i)  # noqa: E731
    n_tok = g(1)
    en_idx = list(LANG_MARKERS).index("en")
    alpha_ratio = F.round(
        g(3) / F.greatest(g(2), F.lit(1)), 6)
    stop_ratio = F.round(
        g(4 + en_idx) / F.greatest(n_tok, F.lit(1)), 6)
    return F.round(
        0.4 * alpha_ratio + 0.4 * stop_ratio
        + 0.2 * F.least(n_tok / F.lit(100.0), F.lit(1.0)), 6)


def _doc_stats_select(df: DataFrame, id_cols: tuple) -> DataFrame:
    """(*id_cols, text, lang_pred, quality) via the counts kernel —
    shared by :func:`doc_stats` and the streaming ingest gate."""
    base = df.select(*id_cols, "text",
                     _doc_stats_counts_kernel()("text").alias("_c"))
    g = lambda i: F.element_at("_c", i)  # noqa: E731
    langs = list(LANG_MARKERS)
    hits = {la: g(4 + j) for j, la in enumerate(langs)}
    best = F.greatest(*hits.values())
    lang_pred = F.when(
        F.col("_c").isNull(), F.lit(None).cast("string")
    ).otherwise(F.coalesce(
        *[F.when((hits[la] == best) & (best > 0), F.lit(la))
          for la in langs],
        F.lit("und")))
    return base.select(*id_cols, "text",
                       lang_pred.alias("lang_pred"),
                       _quality_expr_from_counts().alias("quality"))


def doc_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, text, lang_pred, quality) — the fused stage-1/2 scan
    of :func:`clean_corpus`, numerators from ONE Arrow counts
    kernel (see :func:`_doc_stats_counts_kernel`)."""
    return _doc_stats_select(docs, ("doc_id",))


def clean_corpus(docs: DataFrame, lang: str = "en",
                 min_quality: float = 0.0,
                 simhash_radius: int = 3) -> DataFrame:
    """Survivors of the four-stage cleaning pipeline:
    (doc_id, lang_pred, quality), one row per kept doc.

    ``lang``/``min_quality`` gate stages 1-2; ``simhash_radius`` is
    the near-dup hamming radius for stage 4 (components keep their
    min-doc_id member).  Stage 3 always runs (exact dups never
    survive)."""
    kept = (doc_stats(docs)
            .where((F.col("lang_pred") == lang)
                   & (F.col("quality") >= min_quality)))
    # stage 3: exact dedup — keep the min doc_id per md5(text) group
    # (rank window: one shuffle, no unbounded collect)
    rn = F.row_number().over(
        Window.partitionBy(F.md5("text")).orderBy("doc_id"))
    # stage-3 output feeds two plan branches (the simhash pair scan
    # and the final survivor anti-join) — persist it, or the corpus
    # scan + dedup window re-run per branch
    kept = (kept.withColumn("_rn", rn).where(F.col("_rn") == 1)
            .drop("_rn").persist())
    # stage 4: near-dup components over the SURVIVORS of 1-3 (the
    # stagewise order every production pipeline uses — no point
    # simhashing docs already dropped)
    pairs = simhash_near_pairs(kept, radius=simhash_radius)
    res = (dedup_keep(kept, pairs)
           .select("doc_id", "lang_pred", "quality"))
    # eager finalize: materialize the narrow survivor table, then
    # release the cached stage-3 output (which still carries text)
    # so a long-lived session does not accumulate it
    res = res.localCheckpoint()
    kept.unpersist()
    return res


SAMPLE_HASH_MOD = 4_294_967_296  # 2^32: md5-prefix fraction resolution


def sample_fraction_col(id_col: str = "doc_id") -> Column:
    """Deterministic uniform-(0,1) fraction per id: the first 8 hex
    chars of md5(id-as-string) scaled by 2^-32.

    This is how a 100-TB pipeline samples: a pure map-side predicate
    that is (a) reproducible across runs/engines — no RNG state, the
    DuckDB oracle computes the identical value from the identical
    bytes — and (b) stable under repartitioning, unlike
    ``DataFrame.sample`` whose per-partition RNG changes with the
    split layout."""
    return (F.conv(F.substring(F.md5(F.col(id_col).cast("string")),
                               1, 8), 16, 10).cast("long")
            / F.lit(float(SAMPLE_HASH_MOD)))


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      by: str = "source",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-stratum deterministic sampling (source-mix rebalancing:
    down-weight crawl dumps, keep curated sources whole).

    ``rates`` maps stratum value → keep fraction; strata absent from
    the map are dropped.  Zero shuffles: the rate lookup is a small
    literal map expression and the hash predicate is map-side, so
    the sample composes with a parquet scan without moving data."""
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in kv])
    rate = rate_map.getItem(F.col(by))
    return (docs.where(rate.isNotNull()
                       & (sample_fraction_col(id_col) < rate)))


def mix_rates(docs: DataFrame, mix: dict[str, float],
              budget: int | None = None,
              by: str = "source") -> dict[str, float]:
    """Per-stratum keep rates that land token totals on a target
    mix (the corpus-assembly step of every LLM training recipe —
    Pile/LLaMA-style source weights).

    ``mix`` maps stratum → target fraction of the output token
    budget and must already sum to 1 (NOT renormalized here: a
    normalization sum is float-order-sensitive and would break
    engine reproducibility).  ``budget`` is the output token budget;
    default is the largest budget achievable without oversampling
    any stratum (no rate exceeds 1 — sampling only downsamples;
    upsampling/epoch-repeat is the trainer's job).  Strata with zero
    target weight, zero tokens, or absent from ``mix`` are dropped.

    One aggregation job (per-stratum token totals — a tiny key);
    everything else is driver arithmetic on one scalar per stratum.
    Both the totals->rates arithmetic and the downstream hash
    predicate are engine-reproducible (the DuckDB oracle recomputes
    identical doubles through the identical expression shapes)."""
    if abs(sum(mix.values()) - 1.0) > 1e-9:
        raise ValueError("mix fractions must sum to 1")
    toks = tokens_col()
    totals = {r[by]: int(r["t"]) for r in
              (docs.withColumn("_nt", F.size(toks).cast("long"))
               .groupBy(by).agg(F.sum("_nt").alias("t")).collect())}
    live = {s: f for s, f in mix.items()
            if f > 0 and totals.get(s, 0) > 0}
    if not live:
        return {}
    b = min(totals[s] / live[s] for s in live)
    if budget is not None:
        b = min(float(budget), b)
    return {s: live[s] * b / totals[s] for s in live}


def sample_to_mix(docs: DataFrame, mix: dict[str, float],
                  budget: int | None = None, by: str = "source",
                  id_col: str = "doc_id") -> DataFrame:
    """Assemble a training mix: deterministic hash-sample each
    stratum at :func:`mix_rates` so expected token totals follow the
    target proportions.  Map-side after one totals aggregation —
    composes with a parquet scan without moving data (the
    stratified_sample machinery)."""
    return stratified_sample(docs, mix_rates(docs, mix, budget, by),
                             by=by, id_col=id_col)


def quality_quantile_filter(docs: DataFrame, keep_frac: float,
                            by: str = "source",
                            approximate: bool = False) -> DataFrame:
    """Keep each stratum's top ``keep_frac`` docs by quality score
    (quantile gating: an absolute quality threshold keeps different
    volumes from every source; a per-stratum quantile keeps the mix).

    Default (exact): rank-based, tie-broken on doc_id, so the kept
    set is exactly ``ceil(n_stratum * keep_frac)`` rows and
    deterministic — the oracle pins these semantics.  One shuffle
    (window partition by stratum), but the window SORTS every
    stratum — the wrong shape at 10^12 docs.

    ``approximate=True`` is the 100 TB shape: one
    ``percentile_approx(quality, 1-keep_frac)`` partial-agg per
    stratum (sketch-sized state, rows never sorted), thresholds
    broadcast back, then a map-side ``quality >= cut`` gate.  Keeps
    a slight superset of the exact gate (every doc the exact gate
    keeps whose quality is strictly above the cut is kept here too;
    score ties AT the cut all pass, and the sketch bounds the cut's
    rank error) — the standard trade for per-stratum state that no
    longer grows with stratum size."""
    scored = (docs.select("*", _doc_stats_counts_kernel()("text")
                          .alias("_c"))
              .withColumn("quality", _quality_expr_from_counts())
              .drop("_c"))
    if approximate:
        cuts = scored.groupBy(by).agg(
            F.percentile_approx(
                "quality", F.lit(1.0 - keep_frac)).alias("_cut"))
        return (scored
                .join(F.broadcast(cuts), by)
                .where(F.col("quality") >= F.col("_cut"))
                .drop("_cut"))
    w = Window.partitionBy(by).orderBy(
        F.col("quality").desc(), F.col("doc_id"))
    n = Window.partitionBy(by)
    return (scored
            .withColumn("_rk", F.row_number().over(w))
            .withColumn("_n", F.count("*").over(n))
            .where(F.col("_rk") <= F.ceil(F.col("_n") * F.lit(keep_frac)))
            .drop("_rk", "_n"))


# -------------------------------------------------- URL canonicalization

# Query params that identify a click, not a resource: any two crawls
# of the same page differ in these, so URL-level dedup (stage 0 of
# every Common-Crawl pipeline — cheaper than any content hash because
# it needs no text read at all) must drop them.  utm_* is the GA
# convention; the rest are the big ad/mail platforms' click ids.
TRACKING_PARAM_RE = (
    "^(utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid)=")

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"


def canonical_url_col(col: str = "url") -> Column:
    """Canonical form of an absolute http(s) URL, as a pure
    column expression (JVM built-ins end to end — composes with a
    parquet scan, zero shuffles, whole-stage codegen):

    * fragment stripped (``#...`` never reaches the server);
    * scheme + host lowercased (RFC 3986 §6.2.2.1), path/query
      case preserved;
    * leading ``www.`` and scheme-default ports (``:80``/``:443``)
      dropped;
    * tracking params (TRACKING_PARAM_RE) removed, remaining params
      BYTE-SORTED so ``?a=1&z=2`` and ``?z=2&a=1`` collide;
    * trailing path slashes collapsed, empty path → ``/``.

    Non-absolute inputs (no ``scheme://``) pass through trimmed —
    a cleaning stage must never invent structure.
    """
    u = F.trim(F.col(col))
    nofrag = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(nofrag, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = (F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(host, ":443$", ""))
            .otherwise(host))
    rest = F.regexp_extract(nofrag, _REST_RE, 1)
    path = F.regexp_replace(F.regexp_extract(rest, "^([^?]*)", 1),
                            "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    q = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))
    return F.when(scheme == "", u).otherwise(canon)


def url_filter_stats(pages: DataFrame,
                     blocked_domains: list[str] | None = None,
                     banned_url_words: list[str] | None = None,
                     url_col: str = "url") -> DataFrame:
    """(*original columns, host, domain_blocked, url_word_hits,
    url_keep) — RefinedWeb's URL-level curation stage (Penedo et al.
    2023 §3.1): pages are dropped BEFORE any text is read when their
    host is on a domain blocklist or their URL contains banned
    words.  Both lists are caller-supplied (policy; RefinedWeb uses
    a 4.6M-domain public blocklist + a weighted word list — the
    mechanism is identical for a simple word list).

    * ``host``: lowercased authority, scheme/``www.`` stripped —
      same extraction as :func:`canonical_url_col`.
    * ``domain_blocked``: host equals a blocked domain OR is a
      subdomain of one (suffix match on a dot boundary).
    * ``url_word_hits``: how many banned words occur in the
      lowercased URL (substring, the RefinedWeb convention).
    * ``url_keep``: 1 iff neither rule fires.

    Scale shape: both lists fold into the plan as literal arrays
    (the RefinedWeb-size blocklist would swap in a broadcast join on
    the same ``host`` key — noted, not needed at list sizes that fit
    a literal); one map-side projection over the URL column only —
    parquet never reads text/html for dropped rows when the caller
    filters before selecting them."""
    blocked = sorted({d.lower() for d in (blocked_domains or [])})
    banned = sorted({w.lower() for w in (banned_url_words or [])})
    u = F.lower(F.trim(F.col(url_col)))
    host = F.regexp_extract(u, _HOST_RE, 1)
    host = F.regexp_replace(host, r"^www\.", "")
    # no scheme -> _HOST_RE misses; treat the first path segment as
    # the authority (crawl tables sometimes store schemeless urls)
    host = F.when(host == "", F.regexp_extract(u, "^([^/]+)", 1)) \
        .otherwise(host)
    # host staged once; the rules read the column (the extraction
    # regexes would otherwise re-run per rule reference)
    based = pages.select("*", host.alias("host"))
    hcol = F.col("host")
    if blocked:
        bl = F.array(*[F.lit(d) for d in blocked])
        dom_blocked = F.exists(
            bl, lambda d: (hcol == d)
            | hcol.endswith(F.concat(F.lit("."), d)))
    else:
        dom_blocked = F.lit(False)
    if banned:
        hits = sum((F.when(u.contains(w), 1).otherwise(0)
                    for w in banned), F.lit(0))
    else:
        hits = F.lit(0)
    flagged = based.select(
        "*",
        dom_blocked.cast("int").alias("domain_blocked"),
        hits.cast("long").alias("url_word_hits"))
    return flagged.select(
        "*",
        ((F.col("domain_blocked") == 0) & (F.col("url_word_hits") == 0))
        .cast("int").alias("url_keep"))


def url_filter(pages: DataFrame,
               blocked_domains: list[str] | None = None,
               banned_url_words: list[str] | None = None,
               url_col: str = "url") -> DataFrame:
    """Pages surviving the URL rules, original schema — the stage-0
    gate a crawl pipeline runs before touching any page body."""
    cols = pages.columns
    return (url_filter_stats(pages, blocked_domains,
                             banned_url_words, url_col)
            .where(F.col("url_keep") == 1).select(*cols))


def url_dedup(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Drop crawl-variant rows of the same resource: one survivor
    per canonical URL (min original url — deterministic, engine-
    independent).  One shuffle on the canonical key, before any
    text-reading stage — at crawl scale this is the cheapest dedup
    gate there is (the key is ~100 bytes of URL; content hashing
    reads the corpus).  Skewed canonical keys cannot arise: a
    canonical URL's group size is its crawl-variant count, bounded
    by recrawl frequency, not corpus size."""
    w = Window.partitionBy("canonical_url").orderBy(url_col)
    return (pages
            .withColumn("canonical_url", canonical_url_col(url_col))
            .withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .drop("_rk"))


def pack_token_shards(docs: DataFrame, budget: int,
                      tokens_col_name: str | None = None,
                      target_rows_per_bucket: int = 5000) -> DataFrame:
    """Deterministic token-budget shard assignment — the last stage
    of a training-data pipeline: the cleaned corpus becomes one
    contiguous token stream in doc_id order, chopped into shards of
    ``budget`` tokens each; a doc belongs to the shard where its
    FIRST token lands (docs may straddle a boundary, exactly like
    sequence packing for LM training, where windows ignore doc
    boundaries).  Returns (doc_id, n_tokens, cum_tokens, shard) with
    cum_tokens = inclusive running total by doc_id.

    Scale shape: a bare ``sum() over (order by doc_id)`` collapses
    the corpus onto ONE partition, so this reuses the engine's
    deterministic two-phase numbering scheme
    (sources/web_pages.py::assign_doc_ids): bucket(doc_id) =
    searchsorted over a hash-sampled boundary list (a pure function
    of the data — identical on every recomputation and at every
    parallelism), per-bucket token subtotals -> driver prefix
    offsets (one tiny agg), then a bucket-local running sum.  Token
    counts come from the SQL-portable tokenizer unless
    ``tokens_col_name`` names a precomputed column."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    if tokens_col_name is None:
        d = docs.select("doc_id", F.size(tokens_col()).cast("long")
                        .alias("n_tokens"))
    else:
        d = docs.select("doc_id", F.col(tokens_col_name).cast("long")
                        .alias("n_tokens"))
    n = d.count()
    parts = max(1, min(4096, n // target_rows_per_bucket))
    boundaries: list[int] = []
    if parts > 1:
        sample_mod = max(1, n // (parts * 50))
        sample = sorted(
            r["doc_id"] for r in d.select("doc_id")
            .where(F.pmod(F.xxhash64("doc_id"), F.lit(sample_mod)) == 0)
            .collect())
        if sample:
            stride = max(1, len(sample) // parts)
            boundaries = sorted({sample[i] for i in
                                 range(stride, len(sample), stride)})
    bounds_arr = np.array(boundaries, dtype=np.int64)

    @pandas_udf(IntegerType())
    def _bucket(ids: pd.Series) -> pd.Series:
        if len(bounds_arr) == 0:
            return pd.Series(np.zeros(len(ids), dtype=np.int32))
        return pd.Series(np.searchsorted(
            bounds_arr, ids.to_numpy(dtype=np.int64), side="right"
        ).astype(np.int32))

    sdf = d.withColumn("_b", _bucket(F.col("doc_id")))
    sums = {r["_b"]: r["s"] for r in
            sdf.groupBy("_b").agg(F.sum("n_tokens").alias("s"))
            .collect()}
    offsets, acc = {}, 0
    for b in sorted(sums):
        offsets[b] = acc
        acc += sums[b]
    offmap = F.create_map(*[
        F.lit(x) for kv in offsets.items() for x in kv
    ]) if offsets else F.create_map()
    w = (Window.partitionBy("_b").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (sdf
            .withColumn("cum_tokens",
                        (offmap[F.col("_b")]
                         + F.sum("n_tokens").over(w)).cast("long"))
            .withColumn("shard", F.expr(
                f"(cum_tokens - n_tokens) div {int(budget)}"))
            .select("doc_id", "n_tokens", "cum_tokens", "shard"))


def paragraph_dedup(docs: DataFrame) -> DataFrame:
    """Cross-document paragraph dedup (the C4 / RefinedWeb line-level
    rule): every trimmed non-empty line ("paragraph") that occurs
    more than once in the corpus survives ONLY at its first
    occurrence in (doc_id, position) order; all later copies are cut
    from their documents.  Catches the boilerplate that document-
    level dedup can't (nav bars, cookie banners, license footers
    pasted into otherwise-unique pages).

    Returns (doc_id, n_paras, n_kept, text_clean) for EVERY input
    doc — ``n_paras`` pre-dedup paragraph count, ``text_clean`` the
    survivors rejoined with newlines ('' when nothing survives;
    blank-line structure is not preserved).

    Scale shape: paragraphs are grouped on md5(para) — a fixed-width
    shuffle key, the full text never keys an exchange.  The winner
    per hash is one min(struct(doc_id, idx)) aggregate (map-side
    partial); the join back is winner-row × duplicate-rows = linear
    in corpus paragraphs, never quadratic.  A mega-hot boilerplate
    paragraph (10^8 copies at 100 TB) lands on one reducer as a
    PLAIN count-style skew — AQE skew-join splitting applies; no
    guard needed because each duplicate row meets exactly one
    winner row.  Reconstruction is one groupBy(doc_id) over
    (idx, para) pairs."""
    from .textstats import _lines_col
    lines = _lines_col()
    sizes = docs.select(
        "doc_id", F.size(lines).cast("long").alias("n_paras"))
    paras = docs.select(
        "doc_id", F.posexplode(lines).alias("idx", "para"))
    paras = paras.withColumn("h", F.md5("para"))
    win = (paras.groupBy("h")
           .agg(F.min(F.struct("doc_id", "idx")).alias("w")))
    kept = (paras.join(win, "h")
            .where((F.col("doc_id") == F.col("w.doc_id"))
                   & (F.col("idx") == F.col("w.idx")))
            .select("doc_id", "idx", "para"))
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.count("*").alias("n_kept"),
                    F.concat_ws("\n", F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("idx", "para"))),
                        lambda s: s["para"])).alias("text_clean")))
    return (sizes.join(rebuilt, "doc_id", "left")
            .select("doc_id", "n_paras",
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                     .alias("n_kept"),
                    F.coalesce("text_clean", F.lit(""))
                     .alias("text_clean")))


def train_quality_nb(pos_docs: DataFrame, neg_docs: DataFrame,
                     min_count: int = 1):
    """Train a multinomial Naive-Bayes quality classifier (the
    CCNet / GPT-3 pipeline stage: label a 'good' reference corpus
    positive, random crawl negative, keep pages the model scores
    high).  Returns ``(model, meta)`` — ``model`` a (term, llr)
    DataFrame where llr = ln P(t|pos) − ln P(t|neg) with Laplace
    smoothing over the joint vocabulary, ``meta`` the scalars
    (vocab size, class token totals, doc counts, log-prior).

    Closed-form training = two token-count aggregations and one
    full-outer join — no iterative SGD, no driver-side loops; the
    only ``collect`` is five scalars.  ``min_count`` drops rare
    terms BEFORE the totals so the model (broadcast at score time)
    stays bounded at 100 TB: vocabulary grows ~Heaps n^0.5, and the
    cutoff caps it hard."""
    from .textstats import tokens_col

    def _counts(d: DataFrame, name: str) -> DataFrame:
        return (d.select(F.explode(tokens_col()).alias("term"))
                .groupBy("term").agg(F.count("*").alias(name)))

    counts = (_counts(pos_docs, "cp")
              .join(_counts(neg_docs, "cn"), "term", "full_outer")
              .select("term",
                      F.coalesce("cp", F.lit(0)).alias("cp"),
                      F.coalesce("cn", F.lit(0)).alias("cn")))
    if min_count > 1:
        counts = counts.where(
            F.col("cp") + F.col("cn") >= min_count)
    counts = counts.persist()
    agg = counts.agg(F.count("*").alias("v"),
                     F.sum("cp").alias("tp"),
                     F.sum("cn").alias("tn")).collect()[0]
    v = int(agg["v"])
    tot_p, tot_n = int(agg["tp"] or 0), int(agg["tn"] or 0)
    n_pos, n_neg = pos_docs.count(), neg_docs.count()
    import math
    prior = math.log(n_pos / n_neg) if n_pos and n_neg else 0.0
    model = counts.select(
        "term",
        (F.log((F.col("cp") + 1) / F.lit(float(tot_p + v)))
         - F.log((F.col("cn") + 1) / F.lit(float(tot_n + v))))
        .alias("llr"))
    # eager finalize: the model is vocabulary-bounded (it gets
    # broadcast at score time), so materialize it and release the
    # cached counts deterministically (long-lived sessions must not
    # accumulate fat intermediates)
    model = model.localCheckpoint()
    counts.unpersist()
    meta = {"vocab": v, "tot_pos": tot_p, "tot_neg": tot_n,
            "n_pos": n_pos, "n_neg": n_neg, "prior": prior}
    return model, meta


def nb_quality_score(docs: DataFrame, model: DataFrame,
                     prior: float = 0.0) -> DataFrame:
    """Score every doc with the trained NB model:
    nb_score = Σ_t tf(t) · llr(t) + prior, over terms the model
    knows (out-of-vocabulary terms contribute nothing — the join
    drops them, same rule as the oracle); docs with zero known
    terms score exactly ``prior``.  Rounded to 6 decimals (the
    repo's float-oracle convention — ln/summation-order last-ulp
    noise sits ~1e-11, far under the rounding grain).

    Scale shape: the model is BROADCAST (vocabulary-bounded via
    ``min_count``, never corpus-sized), so the corpus is never
    shuffled on term strings; the only exchanges are the two
    partial-aggregated doc-keyed groupBys."""
    tf = (docs.select("doc_id",
                      F.explode(tokens_col()).alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    s = (tf.join(F.broadcast(model), "term")
         .groupBy("doc_id")
         .agg(F.sum(F.col("tf") * F.col("llr")).alias("s")))
    return (docs.select("doc_id").join(s, "doc_id", "left")
            .select("doc_id",
                    F.round(F.coalesce("s", F.lit(0.0))
                            + F.lit(prior), 6).alias("nb_score")))


# ---- DSIR importance resampling -------------------------------------
# Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
# score every raw-corpus doc by how much more likely its hashed
# n-gram features are under a small TARGET corpus (the data you want
# more of) than under the raw corpus itself, then sample by Gumbel
# top-k over the importance weights.  This is the standard
# "make 100 TB of Common Crawl look like Wikipedia" selection stage.

DSIR_BUCKETS = 4096  # paper uses 10k; any B works, collisions are
#                      part of the estimator (hashed features), not
#                      an approximation of it


def _dsir_bucket(gram: Column, n_buckets: int) -> Column:
    """Hashed-feature bucket id: first 8 hex chars of md5 → uint32 →
    mod B.  Same md5-prefix construction as sample_fraction_col, so
    the DuckDB oracle computes the identical bucket from the
    identical bytes — no RNG, no engine-private hash."""
    return (F.conv(F.substring(F.md5(gram), 1, 8), 16, 10)
            .cast("long") % n_buckets)


def _dsir_feature_rows(docs: DataFrame,
                       n_buckets: int) -> DataFrame:
    """(doc_id, bucket) — one row per unigram+bigram OCCURRENCE
    (DSIR counts occurrences, not distinct features).  Map-side:
    tokenize once (two-step projection per ngrams_of_tokens'
    contract), concat unigrams with bigrams, explode, hash."""
    toked = docs.select("doc_id", lower_tokens_col().alias("_toks"))
    grams = F.concat(F.col("_toks"),
                     ngrams_of_tokens(F.col("_toks"), 2))
    return (toked.select("doc_id", F.explode(grams).alias("g"))
            .select("doc_id",
                    _dsir_bucket(F.col("g"), n_buckets)
                    .alias("bucket")))


def _dsir_bucket_counts(docs: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, c) hashed-feature counts — at most B rows out of a
    partial-aggregated shuffle, regardless of corpus size."""
    return (_dsir_feature_rows(docs, n_buckets)
            .groupBy("bucket").agg(F.count("*").alias("c")))


def dsir_ratio_table(raw: DataFrame, target: DataFrame,
                     n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """(bucket, llr) — llr = ln q̂(b) − ln p̂(b), the per-bucket log
    importance ratio between the target (q) and raw (p) hashed
    n-gram distributions, Laplace-smoothed over all B buckets so
    every bucket (seen or not) has a finite ratio.

    Scale shape: two corpus scans that each collapse to ≤ B rows via
    partial aggregation; the only driver traffic is two scalar
    totals.  The result is B rows — broadcast at score time, the
    corpus never shuffles on feature keys (same shape as the NB
    model above)."""
    tc = _dsir_bucket_counts(target, n_buckets)
    rc = _dsir_bucket_counts(raw, n_buckets)
    return _dsir_ratio_from_counts(tc, rc, n_buckets)


def _dsir_ratio_from_counts(tc: DataFrame, rc: DataFrame,
                            n_buckets: int) -> DataFrame:
    """ratio table from (bucket, c) target/raw count tables —
    factored so :func:`dsir_weights` can derive ``rc`` from its own
    per-doc aggregation (single corpus scan) while
    :func:`dsir_ratio_table` stays the standalone two-table API.

    The two totals stay IN-PLAN (1×1 aggs broadcast-cross-joined,
    the PageRank dangling-mass pattern) rather than driver collects:
    an eager collect would run ``rc``'s lineage as its own job and
    defeat the single-scan ReusedExchange in dsir_weights."""
    tots = (tc.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("tt"))
            .crossJoin(rc.agg(F.coalesce(F.sum("c"), F.lit(0))
                              .alias("tr"))))
    joint = (tc.withColumnRenamed("c", "ct")
             .join(rc.withColumnRenamed("c", "cr"), "bucket",
                   "full_outer")
             .select("bucket",
                     F.coalesce("ct", F.lit(0)).alias("ct"),
                     F.coalesce("cr", F.lit(0)).alias("cr")))
    b = F.lit(n_buckets)
    return (joint.crossJoin(F.broadcast(tots))
            .select("bucket",
                    (F.log((F.col("ct") + 1) / (F.col("tt") + b))
                     - F.log((F.col("cr") + 1) / (F.col("tr") + b)))
                    .alias("llr")))


def dsir_weights(raw: DataFrame, target: DataFrame,
                 n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """(doc_id, lw) — per-doc log importance weight: Σ over the
    doc's hashed unigram+bigram occurrences of the bucket's llr.
    Docs with no features (empty text) weigh exactly 0.  Rounded to
    6 decimals (repo float-oracle convention; ln/summation noise
    sits ~1e-11).

    Scale shape: ONE corpus text scan.  The raw-side bucket counts
    are re-aggregated from the same per-(doc, bucket) shuffle the
    scorer needs (identical subplan → Spark's ReusedExchange serves
    both the ratio table and the scoring join from one shuffle
    write, plan-tested), instead of a second pass over the corpus —
    at 100 TB the text scan dominates, so halving scans halves the
    job.  Then: broadcast join against the B-row ratio table → one
    doc-keyed agg.  Nothing wide carries text."""
    # explicit no-op not-null filters: the scoring join pushes
    # IsNotNull(bucket)/IsNotNull(doc_id) into ITS copy of the
    # aggregation; without the same filters on the rc branch the two
    # subplans don't canonicalize equal and ReuseExchange can't fire
    per = (_dsir_feature_rows(raw, n_buckets)
           .where(F.col("doc_id").isNotNull()
                  & F.col("bucket").isNotNull())
           .groupBy("doc_id", "bucket").agg(F.count("*").alias("n")))
    rc = per.groupBy("bucket").agg(F.sum("n").alias("c"))
    tc = _dsir_bucket_counts(target, n_buckets)
    ratio = _dsir_ratio_from_counts(tc, rc, n_buckets)
    s = (per.join(F.broadcast(ratio), "bucket")
         .groupBy("doc_id")
         .agg(F.sum(F.col("n") * F.col("llr")).alias("s")))
    return (raw.select("doc_id").join(s, "doc_id", "left")
            .select("doc_id",
                    F.round(F.coalesce("s", F.lit(0.0)), 6)
                    .alias("lw")))


def dsir_select(raw: DataFrame, target: DataFrame, k: int,
                n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """Top-k Gumbel importance resampling: key = lw + Gumbel(doc),
    keep the k largest keys (sampling WITHOUT replacement ∝ exp(lw),
    the Gumbel-top-k identity the paper uses).

    The Gumbel noise is deterministic — g = −ln(−ln(u)) with
    u = (md5-prefix("dsir:"+doc_id) + 0.5) / 2³²  ∈ (0, 1) — so the
    selection is reproducible across runs, engines and partitionings
    (the +0.5 keeps u strictly inside the interval: u = 0 would make
    g = −∞).  Key rounded to 6 decimals BEFORE ranking with a
    doc_id tie-break, so rank order is engine-stable (the
    pp_quality_quantile convention).

    Returns (doc_id, lw, key) for the k selected docs."""
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.lit("dsir:"),
                       F.col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("long") + F.lit(0.5))
        / F.lit(float(SAMPLE_HASH_MOD)))
    g = -F.log(-F.log(u))
    keyed = (dsir_weights(raw, target, n_buckets)
             .withColumn("key", F.round(F.col("lw") + g, 6)))
    # orderBy().limit(k) compiles to TakeOrderedAndProject: each
    # partition keeps its local top-k and only k·P candidate rows
    # reach the final merge — the exact top-k stays distributed at
    # any corpus size (never a global single-partition sort)
    return (keyed.orderBy(F.col("key").desc(), "doc_id")
            .limit(k)
            .select("doc_id", "lw", "key"))


# ---- Bigram-LM perplexity scoring (CCNet stage) ----------------------
# CCNet (Wenzek et al. 2020) ranks Common-Crawl pages by the
# perplexity of a small LM trained on a clean target corpus and keeps
# the low-perplexity head.  The LM here is a pruned bigram model with
# STUPID BACKOFF (Brants et al. 2007 — the smoothing invented FOR
# web-scale LMs precisely because it needs only raw counts, no
# discounting statistics): S(w|prev) = c(prev,w)/c(prev·) when the
# bigram survives pruning, else alpha * S(w); S(w) is the
# Laplace-smoothed unigram so out-of-vocabulary tokens stay finite.
# The per-doc score is the mean negative log-score — perplexity in
# log space (stupid backoff is unnormalized, so "score", not
# "probability"; ranking/filtering only needs monotonicity, which is
# exactly how the paper uses it).

LM_ALPHA = 0.4  # Brants et al.'s published backoff weight


def train_backoff_lm(target: DataFrame, min_count: int = 1):
    """Train the pruned backoff bigram LM on a (small) target corpus.

    Returns ``(uni, bi, ctx, meta)``:
      * ``uni``  (w, cu)        unigram counts surviving ``min_count``
      * ``bi``   (prev, w, cb)  bigram counts surviving ``min_count``
      * ``ctx``  (prev, cc)     UNPRUNED context totals (Σ_w c(prev,w))
                                for prevs that kept >=1 bigram — the
                                pruned-LM convention: surviving
                                bigrams keep their true denominator
      * ``meta`` {"tot": T, "vocab": V} unpruned unigram scalars for
                                the Laplace floor (c+1)/(T+V+1)

    Scale shape: two corpus scans, each collapsing to count tables via
    partial aggregation; ``min_count`` bounds all three tables (they
    are broadcast at score time), the way real web LMs are pruned.
    Driver traffic is two scalars."""
    toked = target.select(lower_tokens_col().alias("_toks"))
    uni_all = (toked.select(F.explode("_toks").alias("w"))
               .groupBy("w").agg(F.count("*").alias("cu")))
    uni_all = uni_all.persist()
    agg = uni_all.agg(F.sum("cu").alias("t"),
                      F.count("*").alias("v")).collect()[0]
    meta = {"tot": int(agg["t"] or 0), "vocab": int(agg["v"])}
    uni = uni_all.where(F.col("cu") >= min_count).localCheckpoint()
    uni_all.unpersist()
    bi_all = (toked.select(F.explode(
        ngrams_of_tokens(F.col("_toks"), 2)).alias("g"))
        .select(F.split("g", " ")[0].alias("prev"),
                F.split("g", " ")[1].alias("w"))
        .groupBy("prev", "w").agg(F.count("*").alias("cb")))
    bi_all = bi_all.persist()
    ctx_all = bi_all.groupBy("prev").agg(F.sum("cb").alias("cc"))
    bi = bi_all.where(F.col("cb") >= min_count).localCheckpoint()
    ctx = (ctx_all.join(bi.select("prev").distinct(), "prev")
           .localCheckpoint())
    bi_all.unpersist()
    return uni, bi, ctx, meta


def lm_doc_scores(docs: DataFrame, uni: DataFrame, bi: DataFrame,
                  ctx: DataFrame, meta: dict,
                  alpha: float = LM_ALPHA) -> DataFrame:
    """(doc_id, n_tok, lm_score) — lm_score = −(1/n)·Σ ln S, the
    per-token mean negative log backoff score (lower = more
    target-like; CCNet keeps the low head).  Position 1 scores by
    the unigram alone (no context); later positions by
    ln(cb/cc) when the pruned bigram exists, else
    ln(alpha) + ln(S_uni).  Empty docs: n_tok = 0, lm_score = 0.0.
    Rounded to 6 decimals (float-oracle convention).

    Scale shape: one corpus scan builds (prev, w) pair counts
    map-side (zip_with over two token-array slices — no posexplode,
    the token array is never duplicated per row); all three model
    tables join BROADCAST, so the corpus never shuffles on term
    strings; the only wide exchanges are the two doc-keyed
    partial-agg groupBys."""
    t_v1 = float(meta["tot"] + meta["vocab"] + 1)
    toked = docs.select("doc_id", lower_tokens_col().alias("_toks"))
    sz = F.size("_toks")
    first = F.when(sz >= 1, F.array(F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.element_at("_toks", 1).alias("w")))
    ).otherwise(F.array().cast("array<struct<prev:string,w:string>>"))
    rest = F.when(sz >= 2, F.zip_with(
        F.slice("_toks", 1, sz - 1), F.slice("_toks", 2, sz - 1),
        lambda p, c: F.struct(p.alias("prev"), c.alias("w")))
    ).otherwise(F.array().cast("array<struct<prev:string,w:string>>"))
    pairs = (toked.select("doc_id",
                          F.explode(F.concat(first, rest)).alias("pr"))
             .select("doc_id", "pr.prev", "pr.w")
             .groupBy("doc_id", "prev", "w")
             .agg(F.count("*").alias("n")))
    ln_uni = F.log((F.coalesce("cu", F.lit(0)) + 1) / F.lit(t_v1))
    ln_s = (F.when(F.col("cb").isNotNull(),
                   F.log(F.col("cb") / F.col("cc")))
            .when(F.col("prev").isNotNull(),
                  F.lit(float(np.log(alpha))) + ln_uni)
            .otherwise(ln_uni))
    scored = (pairs
              .join(F.broadcast(uni), "w", "left")
              .join(F.broadcast(bi), ["prev", "w"], "left")
              .join(F.broadcast(ctx), "prev", "left")
              .withColumn("ln_s", ln_s)
              .groupBy("doc_id")
              .agg(F.sum("n").alias("n_tok"),
                   F.sum(F.col("n") * F.col("ln_s")).alias("s")))
    return (docs.select("doc_id").join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
                    F.round(F.coalesce(-F.col("s") / F.col("n_tok"),
                                       F.lit(0.0)), 6)
                    .alias("lm_score")))


def lm_perplexity_filter(docs: DataFrame, target: DataFrame,
                         keep_frac: float, min_count: int = 1,
                         alpha: float = LM_ALPHA) -> DataFrame:
    """CCNet head gate: keep the ``keep_frac`` of docs with the
    LOWEST lm_score (most target-like).  Deterministic rank-based
    cutoff with doc_id tie-break — the quality_quantile_filter
    convention (percentile_approx swap documented there for
    100 TB)."""
    uni, bi, ctx, meta = train_backoff_lm(target, min_count)
    scores = lm_doc_scores(docs, uni, bi, ctx, meta, alpha)
    keep = int(np.ceil(keep_frac * scores.count()))
    # bottom-k via orderBy().limit() = TakeOrderedAndProject: each
    # partition keeps its local k, only k·P candidates reach the
    # merge — never a global single-partition window (the
    # dsir_select scheme)
    return (scores.orderBy("lm_score", "doc_id").limit(keep)
            .select("doc_id", "n_tok", "lm_score"))


def lm_perplexity_buckets(docs: DataFrame, target: DataFrame,
                          cuts: tuple = (1.0 / 3, 2.0 / 3),
                          min_count: int = 1,
                          alpha: float = LM_ALPHA,
                          by: str | None = None,
                          approximate: bool = False) -> DataFrame:
    """CCNet head/middle/tail split (Wenzek et al. 2020 §4.3): every
    doc keeps its LM score and gains a ``bucket`` label — ``head``
    for the most target-like third (lowest lm_score), then
    ``middle``, then ``tail``.  CCNet trains downstream models on
    head (+middle); tail is the usual discard.

    VALUE-based cutoffs (exact percentiles of the score
    distribution), not rank-based: a doc's bucket depends only on
    its own score, so the assignment is reproducible across engines
    and partitionings even though tie runs make bucket SIZES only
    approximately n/3 — this is CCNet's own convention (percentile
    cutoffs computed once, then applied as thresholds).  Cutoff
    floats interpolated between two distinct data values can differ
    between engines by ULPs, but no doc's score lies strictly
    between adjacent sorted values, so the comparisons below are
    engine-stable.

    Scale shape: the score relation is computed ONCE (persisted);
    the two cutoffs are one exact-percentile aggregate (state
    O(distinct scores) on one reducer); bucketing is a map-side
    CASE.  ``approximate=True`` is the 100 TB shape (same
    convention as quality_quantile_filter): the cutoffs come from
    ``percentile_approx`` — sketch-sized reducer state — and every
    cutoff the sketch returns is a REAL score value, so the CASE
    comparisons stay engine-stable; bucket boundaries can shift by
    the sketch's rank error, bucket labels stay value-based.
    Returns (doc_id, n_tok, lm_score, bucket).

    ``by``: CCNet proper buckets PER LANGUAGE (each language gets
    its own tercile cutoffs — a global cut would put whole
    low-resource languages in the tail).  Pass a docs column name
    (e.g. ``lang``): cutoffs become one per-stratum percentile
    aggregate (strata-count rows, broadcast back), output gains the
    stratum column."""
    lo, hi = float(cuts[0]), float(cuts[1])
    uni, bi, ctx, meta = train_backoff_lm(target, min_count)
    scores = lm_doc_scores(docs, uni, bi, ctx, meta, alpha)
    pct_fn = F.percentile_approx if approximate else F.percentile
    pct = pct_fn("lm_score", F.array(F.lit(lo), F.lit(hi)))
    bucket = (F.when(F.col("lm_score") <= F.col("_c1"), F.lit("head"))
              .when(F.col("lm_score") <= F.col("_c2"),
                    F.lit("middle"))
              .otherwise(F.lit("tail")))
    if by is not None:
        scores = scores.join(docs.select("doc_id", by), "doc_id")
        scores = scores.persist()
        cuts_tbl = scores.groupBy(by).agg(
            pct[0].alias("_c1"), pct[1].alias("_c2"))
        out = (scores.join(F.broadcast(cuts_tbl), by)
               .select("doc_id", "n_tok", "lm_score", by,
                       bucket.alias("bucket"))).localCheckpoint()
        scores.unpersist()
        return out
    scores = scores.persist()
    row = scores.agg(pct.alias("cs")).collect()[0]
    c1, c2 = (float(row["cs"][0]), float(row["cs"][1]))
    bucket_lit = (F.when(F.col("lm_score") <= c1, F.lit("head"))
                  .when(F.col("lm_score") <= c2, F.lit("middle"))
                  .otherwise(F.lit("tail")))
    out = scores.select("doc_id", "n_tok", "lm_score",
                        bucket_lit.alias("bucket")).localCheckpoint()
    scores.unpersist()
    return out


# ---- C4 page cleaning rules ------------------------------------------
# The line/page heuristics of C4 (Raffel et al. 2020, §2.2) — the
# other canonical Common-Crawl cleaning recipe next to CCNet above:
# keep a line only if it ends in terminal punctuation, has enough
# words, and doesn't mention javascript; drop a page outright on
# boilerplate markers (curly brace = leftover code, "lorem ipsum" =
# placeholder) or when too little sentence-like text survives.  The
# paper's separate line-DEDUP rule ("three-sentence span seen
# before") is `paragraph_dedup` above; this operator is the
# rule-based half.

C4_END_RE = '[.!?"]$'                  # paper's terminal marks . ! ? "
C4_JS_RE = r"(?i)\bjavascript\b"       # "any line with the word Javascript"
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_SENTENCES = 3


def c4_clean(docs: DataFrame,
             min_words_per_line: int = C4_MIN_WORDS_PER_LINE,
             min_sentences: int = C4_MIN_SENTENCES,
             id_cols: tuple = ("doc_id",)) -> DataFrame:
    """(*id_cols, n_lines, n_kept, n_sent, text_clean) for the pages
    that SURVIVE the C4 page rules; ``text_clean`` is the kept lines
    rejoined with newlines.  ``id_cols`` lets streaming ingest carry
    (url, warc_ts) instead of doc_id — every rule is stateless, so
    the operator runs unchanged on a streaming DataFrame.

    Line kept iff (trimmed): ends in ``. ! ? "``, has >=
    ``min_words_per_line`` whitespace words, and doesn't contain the
    word "javascript" (case-insensitive).  Page dropped iff the raw
    text contains ``{`` or "lorem ipsum" (case-insensitive), or the
    kept lines carry < ``min_sentences`` sentence ends (count of
    ``. ! ?`` characters — a deterministic SQL-portable proxy for
    the paper's NLTK sentence count, documented deviation).

    Scale shape: one map-side projection — every rule is an array /
    regexp built-in over the line split, zero shuffles, whole-stage
    codegen; the corpus is scanned once and never exchanged."""
    from .textstats import _lines_col
    words_ok = lambda l: F.size(F.split(l, r"\s+")) >= min_words_per_line
    kept = F.filter(
        _lines_col(),
        lambda l: l.rlike(C4_END_RE) & words_ok(l)
        & ~l.rlike(C4_JS_RE))
    out = (docs
           .withColumn("_lines", _lines_col())
           .withColumn("_kept", kept)
           .withColumn("_clean", F.array_join("_kept", "\n"))
           .withColumn("_nsent", F.length(
               F.regexp_replace("_clean", "[^.!?]", ""))))
    page_ok = (~F.col("text").contains("{")
               & ~F.lower("text").contains("lorem ipsum")
               & (F.col("_nsent") >= min_sentences))
    return (out.where(page_ok)
            .select(*id_cols,
                    F.size("_lines").cast("long").alias("n_lines"),
                    F.size("_kept").cast("long").alias("n_kept"),
                    F.col("_nsent").cast("long").alias("n_sent"),
                    F.col("_clean").alias("text_clean")))


def badwords_stats(docs: DataFrame, badwords: list[str],
                   id_cols: tuple = ("doc_id",)) -> DataFrame:
    """(*id_cols, bad_hits, bad_keep) — C4's remaining page rule
    (Raffel et al. 2020 §2.2): a page is removed if ANY word on a
    blocklist appears in it.  The paper uses the public "List of
    Dirty, Naughty, Obscene..." list; the list is caller-supplied
    here (policy), the operator is the mechanism.  Matching is on
    lowercased whitespace words with leading/trailing punctuation
    stripped (so "Word." matches "word"), per the list's usage.

    ``bad_hits`` counts matching WORDS (not distinct list entries);
    ``bad_keep`` is 1 iff no hit.  Scale shape: the blocklist (a few
    hundred entries) folds into a literal array in the plan — one
    map-side projection, zero shuffles, whole-stage codegen, streams
    as-is; at 10^12 docs the scan is the only cost."""
    if not badwords:
        raise ValueError("badwords list must be non-empty")
    bw = F.array(*[F.lit(w.lower()) for w in sorted(set(badwords))])
    words = F.transform(
        F.split(F.trim(F.col("text")), r"\s+"),
        lambda w: F.regexp_replace(
            F.lower(w), r"^[^a-z0-9]+|[^a-z0-9]+$", ""))
    hits = F.size(F.filter(words, lambda w: F.array_contains(bw, w)))
    # hit count staged once; the keep flag reads the column (the
    # inline expr would re-scan the word array per reference)
    counted = docs.select(*id_cols,
                          hits.cast("long").alias("bad_hits"))
    return counted.select(
        *id_cols, "bad_hits",
        (F.col("bad_hits") == 0).cast("int").alias("bad_keep"))


def badwords_filter(docs: DataFrame, badwords: list[str]) -> DataFrame:
    """Pages with zero blocklist hits — same map-side predicate,
    composable with the other C4 rules on batch or streaming input."""
    if not badwords:
        raise ValueError("badwords list must be non-empty")
    bw = F.array(*[F.lit(w.lower()) for w in sorted(set(badwords))])
    words = F.transform(
        F.split(F.trim(F.col("text")), r"\s+"),
        lambda w: F.regexp_replace(
            F.lower(w), r"^[^a-z0-9]+|[^a-z0-9]+$", ""))
    return docs.where(
        ~F.exists(words, lambda w: F.array_contains(bw, w)))
