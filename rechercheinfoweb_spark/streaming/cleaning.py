"""Streaming ingest gate: the cleaning pipeline's streamable stages
as a Structured Streaming transformation over web_pages.

A crawl is a stream, so stages 1-3 of ``operators/pipeline.py``
run at ingest time:

* stages 1-2 (language gate + quality threshold) are STATELESS — the
  same fused map-side projection the batch pipeline uses, so a page
  is admitted or dropped the moment it arrives;
* stage 3 (exact dedup) uses ``dropDuplicatesWithinWatermark`` on
  md5(text): state holds only fingerprints younger than the
  watermark horizon, so it is bounded by ingest rate × horizon —
  never by corpus size.  A byte-identical page re-crawled AFTER the
  horizon passes the gate again by design; the periodic batch
  ``clean_corpus`` run over the accepted corpus catches those.

Stage 4 (near-dup components) is deliberately NOT here: pair
generation and connected components are global, so production runs
them as the periodic batch compaction (``pipeline.clean_corpus`` /
``dedup.dedup_clusters``) — same split as the index's streaming
append + batch compaction (`streaming/incremental.py`,
`operators/compact.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F



def streaming_clean(pages: DataFrame, lang: str = "en",
                    min_quality: float = 0.0,
                    watermark: str = "1 hour",
                    c4_rules: bool = False,
                    gopher_rules: bool = False,
                    blocked_domains: list[str] | None = None,
                    banned_url_words: list[str] | None = None,
                    badwords: list[str] | None = None) -> DataFrame:
    """Admit-or-drop gate over a streaming web_pages DataFrame.

    Input columns: (url, warc_ts, text, ...) — the input_hint shape.
    Output: (url, warc_ts, text, lang_pred, quality) for pages that
    pass the language gate, the quality threshold, and first-seen
    exact dedup within the watermark horizon.

    ``blocked_domains``/``banned_url_words`` (RefinedWeb stage 0,
    ``pipeline.url_filter``) and ``badwords`` (C4's blocklist page
    rule, ``pipeline.badwords_filter``) run FIRST when given — both
    stateless map-side predicates, so they stream as-is, and the URL
    gate drops pages before any text expression runs.

    ``c4_rules`` first REWRITES each page through the C4 line rules
    and drops pages failing the C4 page rules
    (``pipeline.c4_clean`` — stateless, so it streams as-is; the
    admitted page's text is the cleaned text, as in the C4
    pipeline).  ``gopher_rules`` then drops pages failing the Gopher
    A1 quality gate (``textstats.gopher_filter`` — the shared Arrow
    counts kernel; pandas UDFs stream, and the kernel is ~8× faster
    than the inline-expression trees which re-tokenize per feature).
    Both default off to preserve the original gate; order is
    rules-then-dedup, the production (C4/MassiveText) sequence.

    Duplicate-group tie-break: the streaming path keeps the first
    PROCESSED member (``dropDuplicatesWithinWatermark`` semantics —
    arrival order, which is nondeterministic within a micro-batch);
    on a batch DataFrame this function instead canonicalizes by
    (warc_ts, url).  The SET of surviving texts — and therefore
    every downstream statistic — is identical either way; only which
    url represents a duplicate group can differ, which is inherent
    to streaming dedup (no total order exists over an unbounded
    stream).  The streaming==batch test compares at content level
    for exactly this reason."""
    if blocked_domains or banned_url_words:
        from ..operators.pipeline import url_filter
        pages = url_filter(pages, blocked_domains, banned_url_words)
    if badwords:
        from ..operators.pipeline import badwords_filter
        pages = badwords_filter(pages, badwords)
    if c4_rules:
        from ..operators.pipeline import c4_clean
        pages = (c4_clean(pages, id_cols=("url", "warc_ts"))
                 .withColumnRenamed("text_clean", "text")
                 .drop("n_lines", "n_kept", "n_sent"))
    if gopher_rules:
        from ..operators.textstats import gopher_filter
        pages = gopher_filter(pages)
    # fused lang/quality numerators from the shared Arrow counts
    # kernel (pipeline._doc_stats_select; streams as-is)
    from ..operators.pipeline import _doc_stats_select
    stats = _doc_stats_select(
        pages, ("url", "warc_ts")).withColumn(
        "_h", F.md5("text"))
    kept = stats.where((F.col("lang_pred") == lang)
                       & (F.col("quality") >= min_quality))
    if kept.isStreaming:
        kept = (kept.withWatermark("warc_ts", watermark)
                .dropDuplicatesWithinWatermark(["_h"]))
    else:
        # batch twin: global first-seen (min warc_ts, then url)
        from pyspark.sql.window import Window
        rn = F.row_number().over(
            Window.partitionBy("_h").orderBy("warc_ts", "url"))
        kept = kept.withColumn("_rn", rn).where(
            F.col("_rn") == 1).drop("_rn")
    return kept.drop("_h")
