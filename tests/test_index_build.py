"""Index-build integration tests: df/stats vs oracle, resume
semantics (SURVEY.md §5.6), determinism across parallelism."""

import shutil

import pytest
from pyspark.sql import functions as F

from rechercheinfoweb_spark.operators.index_build import build_index


def _postings_fingerprint(spark, out_dir: str):
    rows = (spark.read.parquet(f"{out_dir}/postings")
            .select("term", "salt", "df_part", "min_doc_id", "blocks")
            .orderBy("term", "salt").collect())
    return hash(str(rows))


def test_df_and_stats_match_oracle(spark, reader, oracle_index):
    postings = spark.read.parquet(reader.paths.postings)
    got_df = {r["term"]: r["df"] for r in
              postings.groupBy("term").agg(
                  F.sum(F.expr("aggregate(blocks, 0L, (a, x) -> a + x.n)"))
                  .alias("df")).collect()}
    exp_df = {t: len(pl) for t, pl in oracle_index.postings.items()}
    assert got_df == exp_df
    # the dictionary table's global df agrees with the block recount
    stored = {r["term"]: r["df"] for r in
              spark.read.parquet(reader.paths.dictionary)
              .select("term", "df").collect()}
    assert stored == exp_df

    stats = spark.read.parquet(reader.paths.corpus_stats).collect()[0]
    assert stats["n_docs"] == oracle_index.n_docs
    assert stats["vocabulary"] == len(oracle_index.postings)
    assert stats["n_raw_tokens"] == oracle_index.n_raw_tokens
    assert stats["sum_dl"] == oracle_index.sum_dl
    assert stats["avgdl"] == oracle_index.avgdl


def test_doc_ids_deterministic_by_url(spark, reader, oracle_index):
    docs = {r["doc_id"]: r["url"] for r in reader.docs().collect()}
    assert docs == oracle_index.doc_url


def test_resume_skips_completed(spark, pages_df, tmp_path):
    out = str(tmp_path / "idx")
    build_index(spark, pages_df, out, n_chunks=2, n_buckets=4)
    res = build_index(spark, pages_df, out, n_chunks=2, n_buckets=4,
                      resume=True)
    assert set(res.resumed_stages) == {
        "stage0", "chunk-0000", "chunk-0001", "finalize"}


def test_crash_resume_identical(spark, pages_df, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_index(spark, pages_df, a, n_chunks=2, n_buckets=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, pages_df, b, n_chunks=2, n_buckets=4,
                    fail_after_chunk=0)
    res = build_index(spark, pages_df, b, n_chunks=2, n_buckets=4,
                      resume=True)
    assert "chunk-0000" in res.resumed_stages
    assert "chunk-0001" not in res.resumed_stages
    assert _postings_fingerprint(spark, a) == _postings_fingerprint(spark, b)


def test_changed_input_invalidates(spark, pages_df, tmp_path):
    from rechercheinfoweb_spark.sources.web_pages import \
        synthetic_web_pages
    out = str(tmp_path / "idx")
    build_index(spark, pages_df, out, n_chunks=2, n_buckets=4)
    other = synthetic_web_pages(spark, 37)
    res = build_index(spark, other, out, n_chunks=2, n_buckets=4,
                      resume=True)
    assert res.resumed_stages == []
    assert res.n_docs == 37


def test_parallelism_invariance(spark, pages_df, tmp_path, reader):
    """Same input at different shuffle parallelism → identical index
    (the property the N-vs-4N scaling evidence relies on)."""
    out = str(tmp_path / "idx8")
    repartitioned = pages_df.repartition(16)
    build_index(spark, repartitioned, out, n_chunks=2, n_buckets=8)
    assert (_postings_fingerprint(spark, out)
            == _postings_fingerprint(spark, reader.paths.out_dir))


def _reader_view(spark, out):
    """Everything a reader resolves from one snapshot: scoring
    scalars, the pinned chunk set, and an actual query result."""
    from rechercheinfoweb_spark.operators.query_vector import (
        IndexReader, vector_topk,
    )
    r = IndexReader(spark, out)
    top = [(row["doc_id"], row["score"]) for row in
           vector_topk(spark, r, "search engine ranking",
                       "bm25", k=10).collect()]
    return {"n_docs": r.n_docs, "max_chunk": r.max_chunk,
            "salt_map": r.salt_map, "avgdl": r.avgdl,
            "vocabulary": r.vocabulary, "topk": top}


def test_finalize_crash_publishes_atomically(spark, pages_df,
                                             tmp_path, monkeypatch):
    """A crash at ANY point inside finalize_index leaves readers on
    the previous fully-consistent (dictionary, registry, stats)
    snapshot — never new df values against old postings pins.  The
    live corpus_stats write is the single commit point."""
    from rechercheinfoweb_spark.operators import index_build
    from rechercheinfoweb_spark.streaming.incremental import (
        append_batch, refresh,
    )
    from rechercheinfoweb_spark.sources.web_pages import \
        synthetic_web_pages

    out = str(tmp_path / "idx")
    build_index(spark, pages_df, out, n_chunks=2, n_buckets=4)
    before = _reader_view(spark, out)

    extra = synthetic_web_pages(spark, 40).withColumn(
        "url", F.concat(F.lit("http://batch2/"), F.col("url")))
    assert append_batch(spark, extra, out, batch_id=1,
                        n_buckets=4)["n_docs"] == 40
    # appended but unpublished: readers still see the old snapshot
    assert _reader_view(spark, out) == before

    real_stats = index_build._write_corpus_stats
    live = index_build.IndexPaths(out).corpus_stats

    def crash_at_commit(path, **values):
        if path == live:
            raise RuntimeError("injected failure: crash at commit")
        real_stats(path, **values)

    # scenario A: crash at the live-commit point — versioned
    # dictionary/registry/stats for v2 are already on disk
    monkeypatch.setattr(index_build, "_write_corpus_stats",
                        crash_at_commit)
    with pytest.raises(RuntimeError, match="injected"):
        refresh(spark, out)
    assert _reader_view(spark, out) == before

    # scenario B: crash EARLIER, while writing the versioned registry
    monkeypatch.setattr(index_build, "_write_corpus_stats", real_stats)
    real_reg = index_build.write_registry

    def crash_at_registry(path, rows):
        if ".v" in os.path.basename(path):
            raise RuntimeError("injected failure: crash at registry")
        real_reg(path, rows)

    import os
    monkeypatch.setattr(index_build, "write_registry",
                        crash_at_registry)
    with pytest.raises(RuntimeError, match="injected"):
        refresh(spark, out)
    assert _reader_view(spark, out) == before

    # recovery: a clean re-run publishes everything at once
    monkeypatch.setattr(index_build, "write_registry", real_reg)
    refresh(spark, out)
    after = _reader_view(spark, out)
    assert after["n_docs"] == before["n_docs"] + 40
    assert after["max_chunk"] > before["max_chunk"]
    # the crashed attempts' orphaned version dirs were skipped, not
    # reused: the published version is strictly newer than all of them
    import pyarrow.parquet as pq
    stats = pq.read_table(live).to_pylist()[0]
    assert stats["dict_version"] >= 4
