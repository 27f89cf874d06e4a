"""Streaming tests (file source + availableNow trigger, no sleeps).

Key invariant: streaming ingestion + refresh must produce an index
that answers queries exactly like a batch build over the same pages —
same global stats, rank-identical BM25 top-k (scores equal at 1e-9;
doc ids may differ because streaming assigns ids per arrival batch,
so we compare by url)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from rechercheinfoweb_spark.operators.index_build import build_index
from rechercheinfoweb_spark.operators.query_vector import (
    IndexReader, vector_topk,
)
from rechercheinfoweb_spark.sources.web_pages import (
    WEB_PAGES_SCHEMA, synthetic_web_pages,
)
from rechercheinfoweb_spark.streaming import events as sev
from rechercheinfoweb_spark.streaming import incremental as inc

N = 120


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    """Three parquet files == three micro-batches of pages."""
    src = str(tmp_path_factory.mktemp("stream_src"))
    pages = synthetic_web_pages(spark, N).collect()
    for i, lo in enumerate(range(0, N, N // 3 + 1)):
        batch = pages[lo:lo + N // 3 + 1]
        spark.createDataFrame(batch, WEB_PAGES_SCHEMA) \
            .coalesce(1).write.parquet(f"{src}/b{i}")
    return src


def test_incremental_matches_batch(spark, tmp_path_factory, stream_src):
    out = str(tmp_path_factory.mktemp("inc_idx"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    shutil.rmtree(out, ignore_errors=True)

    stream = (spark.readStream.schema(WEB_PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{stream_src}/*/"))
    q = inc.index_web_pages_stream(spark, stream, out, ckpt,
                                   n_buckets=8)
    q.awaitTermination(300)
    info = inc.refresh(spark, out, n_buckets=8)
    assert info["n_chunks"] >= 2  # really arrived as multiple batches

    ref_dir = str(tmp_path_factory.mktemp("batch_idx"))
    build_index(spark, synthetic_web_pages(spark, N), ref_dir,
                n_chunks=2, n_buckets=8)
    r_inc, r_bat = IndexReader(spark, out), IndexReader(spark, ref_dir)
    assert r_inc.n_docs == r_bat.n_docs == N
    assert r_inc.vocabulary == r_bat.vocabulary
    assert abs(r_inc.avgdl - r_bat.avgdl) < 1e-12

    for query in ("search engine ranking", "Spark shuffle"):
        a = [(r["url"], r["score"]) for r in
             vector_topk(spark, r_inc, query, "bm25", k=10,
                         with_urls=True).collect()]
        b = [(r["url"], r["score"]) for r in
             vector_topk(spark, r_bat, query, "bm25", k=10,
                         with_urls=True).collect()]
        assert len(a) == len(b) > 0
        for (ua, sa), (ub, sb) in zip(a, b):
            assert ua == ub and abs(sa - sb) < 1e-9


def test_append_batch_idempotent(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idem_idx"))
    pages = synthetic_web_pages(spark, 30)
    i1 = inc.append_batch(spark, pages, out, batch_id=0)
    assert i1["n_docs"] == 30
    # replay of the same batch_id must be a no-op
    assert inc.append_batch(spark, pages, out, batch_id=0) is None
    i2 = inc.append_batch(spark, pages.limit(10), out, batch_id=1)
    assert i2["first_doc_id"] == 31 and i2["chunk"] == 1


def test_append_batch_reconciles_after_crash(spark, tmp_path_factory):
    """Crash window between the atomic registry commit and the
    manifest write: on replay the registry's batch_id row is the
    commit marker — the batch must NOT be re-appended (which would
    duplicate every document under fresh ids), only the missing
    manifest is reconciled."""
    from rechercheinfoweb_spark.operators.index_build import IndexPaths
    from rechercheinfoweb_spark.plans.checkpoints import read_manifest

    out = str(tmp_path_factory.mktemp("crash_idx"))
    pages = synthetic_web_pages(spark, 25)
    inc.append_batch(spark, pages, out, batch_id=0)
    # simulate the crash: batch 1's data + registry landed, but the
    # process died before its manifest
    inc.append_batch(spark, pages.limit(10), out, batch_id=1)
    mpath = os.path.join(out, "manifests", "stream-batch-000001.json")
    os.remove(mpath)

    assert inc.append_batch(spark, pages.limit(10), out,
                            batch_id=1) is None  # reconciled, no-op
    reg = inc.read_registry(IndexPaths(out).chunks)
    assert [r["chunk"] for r in reg] == [0, 1]  # no duplicate chunk
    m = read_manifest(out, "stream-batch-000001")
    assert m is not None and m.get("reconciled") is True
    assert m["n_docs"] == 10


def test_live_readers_pin_snapshot_across_append_and_refresh(
        spark, tmp_path_factory):
    """Readers opened before an append/refresh serve the OLD snapshot
    with bit-identical results the whole time — never a mixed view
    (new postings with old df, or vice versa).  The pin has three
    legs: salt ≤ max_chunk filters appended chunks out, corpus_stats
    is one atomically-replaced file, and refresh publishes the new
    dictionary as a NEW version dir while keeping the previous one
    for live readers (query_vector.py:58-64 claims this; here it's
    pinned)."""
    from rechercheinfoweb_spark.operators.serve_local import (
        LocalSearcher,
    )

    out = str(tmp_path_factory.mktemp("live_idx"))
    pages = synthetic_web_pages(spark, 120).collect()
    first = spark.createDataFrame(pages[:80], WEB_PAGES_SCHEMA)
    extra = spark.createDataFrame(pages[80:], WEB_PAGES_SCHEMA)
    build_index(spark, first, out, n_chunks=2, n_buckets=8)

    r_old = IndexReader(spark, out)
    l_old = LocalSearcher(out)
    q = "search engine ranking"

    def spark_res(reader):
        return [(r["doc_id"], r["score"]) for r in
                vector_topk(spark, reader, q, "bm25", k=10).collect()]

    before = spark_res(r_old)
    l_before = l_old.vector_query(q, "bm25", k=10)
    assert before and before == l_before

    # 1. un-refreshed append: invisible to live AND to newly-opened
    # readers (corpus_stats still pins the old max_chunk)
    inc.append_batch(spark, extra, out, batch_id=7, n_buckets=8)
    assert spark_res(r_old) == before
    assert l_old.vector_query(q, "bm25", k=10) == l_before
    assert spark_res(IndexReader(spark, out)) == before
    assert LocalSearcher(out).vector_query(q, "bm25", k=10) == l_before

    # 2. refresh publishes the new snapshot — but readers opened on
    # the old one keep answering from it, scores equal to the bit
    inc.refresh(spark, out, n_buckets=8)
    assert spark_res(r_old) == before
    assert l_old.vector_query(q, "bm25", k=10) == l_before

    # 3. readers opened after the refresh see the full corpus
    r_new = IndexReader(spark, out)
    assert r_new.n_docs == 120
    assert LocalSearcher(out).n_docs == 120
    after = spark_res(r_new)
    # global df changed (80 → 120 docs), so old-snapshot scores must
    # NOT leak into the new view
    assert after != before
    assert LocalSearcher(out).vector_query(q, "bm25", k=10) == after


@pytest.fixture(scope="module")
def events_src(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("events_src"))
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .where(F.col("user_id") < 12)
    ev.orderBy("ts").coalesce(1).write.parquet(f"{src}/all")
    return src, ev


def test_windowed_event_counts_stream(spark, events_src):
    src, ev = events_src
    stream = (spark.readStream.schema(ev.schema).parquet(f"{src}/*/"))
    out = sev.windowed_event_counts(stream, window="1 hour")
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("win_counts")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from win_counts")
    # append-mode emits a window once the watermark (max_ts - 2h)
    # passes its end — windows inside the final horizon stay open
    import datetime as dt
    batch = (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n")))
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - dt.timedelta(hours=4)  # 2h wm + 1h win + margin
    want = {(r["w"]["start"], r["event_type"]): r["n"]
            for r in batch.where(F.col("w.start") < F.lit(horizon))
            .collect()}
    have = {(r["window_start"], r["event_type"]): r["n"]
            for r in got.collect()}
    assert want, "horizon filter left nothing to compare"
    for k, v in want.items():
        assert have.get(k) == v, k
    # and every emitted window must agree with the batch truth
    full = {(r["w"]["start"], r["event_type"]): r["n"]
            for r in batch.collect()}
    for k, v in have.items():
        assert full.get(k) == v, k


def test_sessionize_stream(spark, events_src):
    src, ev = events_src
    stream = (spark.readStream.schema(ev.schema).parquet(f"{src}/*/"))
    out = sev.sessionize_stream(stream.select("user_id", "ts"))
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("sessions")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(
        "select user_id, count(*) as n_sessions from sessions "
        "where closed = 1 group by user_id")
    have = {r["user_id"]: r["n_sessions"] for r in got.collect()}
    # batch truth: sessions with a 30-min gap; the LAST session per
    # user is still open in the stream (no timeout fires under
    # availableNow), so closed-count = batch-count - 1 per user
    epoch = F.col("ts").cast("timestamp").cast("long")
    from pyspark.sql.window import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch - F.lag(epoch).over(w)
    batch = (ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id").agg(F.sum("new_sess").alias("n")))
    for r in batch.collect():
        assert have.get(r["user_id"], 0) == r["n"] - 1, r


def test_streaming_clean_gate(spark, tmp_path_factory):
    """streaming_clean == its batch twin on the same pages, and the
    within-watermark exact-dedup state drops re-crawled duplicates
    (first arrival wins)."""
    from rechercheinfoweb_spark.streaming.cleaning import (
        streaming_clean,
    )

    src = str(tmp_path_factory.mktemp("clean_src"))
    pages = synthetic_web_pages(spark, 80).drop("html")
    # inject exact duplicates: 10 pages re-crawled 5 min later under
    # new urls (same text bytes => same md5 => must be dropped)
    dups = (pages.orderBy("url").limit(10)
            .withColumn("url", F.concat(F.lit("https://mirror.example/"),
                                        F.col("url")))
            .withColumn("warc_ts",
                        F.col("warc_ts") + F.expr("INTERVAL 5 MINUTES")))
    allp = pages.unionByName(dups)
    pages.write.parquet(f"{src}/b0")
    dups.write.parquet(f"{src}/b1")

    stream = spark.readStream.schema(allp.schema).parquet(f"{src}/*/")
    out = streaming_clean(stream, lang="en", min_quality=0.0,
                          watermark="1 hour")
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("cleaned")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from cleaned").collect()

    # CONTENT-level equality with the batch twin: which url survives
    # a duplicate group is a tie-break the two paths resolve
    # differently by design (streaming = first processed, batch =
    # min warc_ts/url), so compare the surviving text set + stats
    want = streaming_clean(allp, lang="en", min_quality=0.0).collect()
    key = lambda r: (r["text"], r["lang_pred"], r["quality"])
    assert sorted(map(key, got)) == sorted(map(key, want))
    # every injected duplicate text must appear exactly once
    got_texts = [r["text"] for r in got]
    assert len(got_texts) == len(set(got_texts))
    # each dup group's survivor is one of its two members
    dup_urls = {r["url"] for r in dups.collect()}
    orig_urls = {r["url"] for r in pages.collect()}
    for r in got:
        assert r["url"] in dup_urls | orig_urls


def test_streaming_clean_with_c4_and_gopher_rules(
        spark, tmp_path_factory):
    """The C4 rewrite + Gopher gate compose into the streaming
    ingest path (stateless stages stream as-is) and match the batch
    twin at content level."""
    from pyspark.sql import functions as F

    from rechercheinfoweb_spark.operators import textstats
    from rechercheinfoweb_spark.operators.pipeline import c4_clean
    from rechercheinfoweb_spark.streaming.cleaning import (
        streaming_clean,
    )

    src = str(tmp_path_factory.mktemp("c4g_src"))
    pages = synthetic_web_pages(spark, 120).drop("html")
    # synthetic text is single-line/unpunctuated: derive sentence
    # structure + stopword mass so the gates have survivors AND
    # casualties (same trick as the pp_c4_clean contract query)
    t = F.replace(F.col("text"), F.lit(" search "), F.lit(".\n"))
    t = F.replace(t, F.lit(" query "), F.lit(".\n"))
    t = F.replace(t, F.lit(" WAND "), F.lit("…\n"))
    t = F.concat(t, F.lit(
        ". \nIt would have been good to be with all of that too."))
    pages = pages.withColumn("text", t)
    half = pages.randomSplit([0.5, 0.5], seed=7)
    half[0].write.parquet(f"{src}/b0")
    half[1].write.parquet(f"{src}/b1")

    stream = spark.readStream.schema(pages.schema).parquet(f"{src}/*/")
    out = streaming_clean(stream, lang="en", min_quality=0.0,
                          c4_rules=True, gopher_rules=True)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("c4g_cleaned")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from c4g_cleaned").collect()

    want = streaming_clean(pages, lang="en", min_quality=0.0,
                           c4_rules=True, gopher_rules=True).collect()
    key = lambda r: (r["text"], r["lang_pred"], r["quality"])
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert 0 < len(got) < pages.count()  # survivors AND casualties
    # the admitted text IS the C4-rewritten text: independently
    # recompute c4_clean -> gopher over the batch input
    manual = (c4_clean(pages, id_cols=("url",))
              .withColumnRenamed("text_clean", "text")
              .where(textstats.gopher_keep_col()))
    manual_texts = {r["text"] for r in manual.collect()}
    assert {r["text"] for r in got} <= manual_texts


def test_streaming_clean_with_url_and_badwords_gates(
        spark, tmp_path_factory):
    """The RefinedWeb URL gate + C4 bad-words rule compose into the
    streaming ingest path (stateless map-side predicates) and match
    the batch twin exactly — including which pages the URL rule
    drops before any text expression runs."""
    from pyspark.sql import functions as F

    from rechercheinfoweb_spark.operators.pipeline import (
        badwords_filter, url_filter,
    )
    from rechercheinfoweb_spark.streaming.cleaning import (
        streaming_clean,
    )

    src = str(tmp_path_factory.mktemp("ubw_src"))
    pages = synthetic_web_pages(spark, 100).drop("html")
    blocked = [f"host{i}.example" for i in range(5)]   # ~5% of urls
    badwords = ["shuffle"]                             # common token
    half = pages.randomSplit([0.5, 0.5], seed=11)
    half[0].write.parquet(f"{src}/b0")
    half[1].write.parquet(f"{src}/b1")

    stream = spark.readStream.schema(pages.schema).parquet(f"{src}/*/")
    out = streaming_clean(stream, lang="en", min_quality=0.0,
                          blocked_domains=blocked, badwords=badwords)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("ubw_cleaned")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from ubw_cleaned").collect()

    want = streaming_clean(pages, lang="en", min_quality=0.0,
                           blocked_domains=blocked,
                           badwords=badwords).collect()
    key = lambda r: (r["text"], r["lang_pred"], r["quality"])
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert 0 < len(got) < pages.count()
    # survivors are exactly the pages passing both standalone gates
    # (plus the unchanged lang gate downstream)
    manual = badwords_filter(
        url_filter(pages, blocked), badwords)
    manual_urls = {r["url"] for r in manual.collect()}
    assert {r["url"] for r in got} <= manual_urls
    blocked_urls = {r["url"] for r in pages.collect()} - manual_urls
    assert not ({r["url"] for r in got} & blocked_urls)
