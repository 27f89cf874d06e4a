"""Compaction tests — chunk merge must be invisible to every query
surface (bit-identical scores, identical boolean sets), safe for live
readers, and composable with streaming appends.

The reference has no compaction (its index is a one-shot in-RAM
build); this operator exists for the streaming/10^12-doc shape the
north rule adds, so its correctness bar is self-consistency against
the engine's own pre-compaction answers plus the pure-Python oracle
rank-identity that pins all query paths."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rechercheinfoweb_spark.operators.compact import (
    compact_chunks, plan_groups,
)
from rechercheinfoweb_spark.operators.index_build import (
    IndexPaths, build_index, read_registry,
)
from rechercheinfoweb_spark.operators.query_bool import boolean_search
from rechercheinfoweb_spark.operators.query_vector import (
    IndexReader, vector_topk,
)
from rechercheinfoweb_spark.operators.serve_local import LocalSearcher
from rechercheinfoweb_spark.sources.web_pages import (
    WEB_PAGES_SCHEMA, synthetic_web_pages,
)
from rechercheinfoweb_spark.streaming import incremental as inc

N = 160
QUERIES = ("search engine ranking", "Spark shuffle partition",
           "varint delta BM25")
BOOLS = ("search AND engine", "index OR postings AND NOT merge")


def _snapshot(spark, reader):
    """Every query surface's answers for one reader."""
    out = {}
    for q in QUERIES:
        for scheme in ("bm25", "norm"):
            out[(q, scheme)] = [
                (r["doc_id"], r["score"]) for r in
                vector_topk(spark, reader, q, scheme, k=10).collect()]
    for q in BOOLS:
        out[q] = sorted(r["doc_id"] for r in
                        boolean_search(spark, reader, q).collect())
    return out


@pytest.fixture(scope="module")
def compacted(spark, tmp_path_factory):
    """Index built at 8 chunks, queried, compacted to ~2, queried."""
    out = str(tmp_path_factory.mktemp("cmp_idx"))
    pages = synthetic_web_pages(spark, N)
    build_index(spark, pages, out, n_chunks=8, n_buckets=8)
    before = _snapshot(spark, IndexReader(spark, out))
    l_before = LocalSearcher(out).vector_query(QUERIES[0], "bm25", k=10)
    info = compact_chunks(spark, out, target_docs=N // 2 + 1)
    return out, before, l_before, info


def test_compact_merges_chunks(spark, compacted):
    out, _before, _lb, info = compacted
    assert info["merged_groups"] >= 2
    assert info["n_chunks_after"] < info["n_chunks_before"] == 8
    reader = IndexReader(spark, out)
    assert len(reader.salt_map) == info["n_chunks_after"]
    assert reader.n_docs == N
    # merged ranges must tile the corpus exactly
    spans = sorted(reader.salt_map.values())
    assert spans[0][0] == 1
    for (a, na), (b, _nb) in zip(spans, spans[1:]):
        assert a + na == b
    assert spans[-1][0] + spans[-1][1] == N + 1


def test_compact_query_results_bit_identical(spark, compacted):
    out, before, l_before, _info = compacted
    after = _snapshot(spark, IndexReader(spark, out))
    assert after == before  # scores to the last bit, same ids
    assert LocalSearcher(out).vector_query(
        QUERIES[0], "bm25", k=10) == l_before


def test_compact_noop_when_within_target(spark, compacted):
    out, _b, _l, _info = compacted
    reg0 = read_registry(IndexPaths(out).chunks)
    info = compact_chunks(spark, out, target_docs=N // 2 + 1)
    assert info["merged_groups"] == 0
    assert read_registry(IndexPaths(out).chunks) == reg0


def test_live_reader_survives_compaction(spark, tmp_path_factory):
    """A reader opened pre-compaction keeps serving its snapshot:
    keep_previous retains its chunk dirs until the next cycle."""
    out = str(tmp_path_factory.mktemp("cmp_live"))
    build_index(spark, synthetic_web_pages(spark, 100), out,
                n_chunks=5, n_buckets=8)
    r_old = IndexReader(spark, out)
    l_old = LocalSearcher(out)
    before = _snapshot(spark, r_old)
    lb = l_old.vector_query(QUERIES[0], "bm25", k=10)
    info = compact_chunks(spark, out, target_docs=60)
    assert info["merged_groups"] >= 1
    assert info["pruned_chunks"] == []  # old dirs kept for r_old
    assert _snapshot(spark, r_old) == before
    assert l_old.vector_query(QUERIES[0], "bm25", k=10) == lb
    # a second cycle ages the old snapshot out and reclaims its dirs
    info2 = compact_chunks(spark, out, target_docs=200,
                           keep_previous=False)
    merged_away = set(info["merged_chunks"]) | set(
        info2.get("merged_chunks", []))
    reg = {r["chunk"] for r in read_registry(IndexPaths(out).chunks)}
    postings = IndexPaths(out).postings
    on_disk = {int(d.split("=")[1])
               for b in os.listdir(postings) if b.startswith("bucket=")
               for d in os.listdir(os.path.join(postings, b))
               if d.startswith("salt=")}
    assert on_disk == reg  # nothing but the live snapshot remains
    assert not (on_disk & (merged_away - reg))


def test_compact_then_append_then_refresh(spark, tmp_path_factory):
    """Appends after compaction continue the id space correctly and
    the next refresh publishes a consistent union snapshot."""
    out = str(tmp_path_factory.mktemp("cmp_app"))
    pages = synthetic_web_pages(spark, 120).collect()
    first = spark.createDataFrame(pages[:90], WEB_PAGES_SCHEMA)
    extra = spark.createDataFrame(pages[90:], WEB_PAGES_SCHEMA)
    build_index(spark, first, out, n_chunks=6, n_buckets=8)
    compact_chunks(spark, out, target_docs=50)
    inc.append_batch(spark, extra, out, batch_id=3, n_buckets=8)
    inc.refresh(spark, out, n_buckets=8)
    reader = IndexReader(spark, out)
    assert reader.n_docs == 120
    spans = sorted(reader.salt_map.values())
    assert spans[0][0] == 1
    for (a, na), (b, _nb) in zip(spans, spans[1:]):
        assert a + na == b
    assert spans[-1][0] + spans[-1][1] == 121
    # equivalence with a one-shot batch build over the same pages
    ref = str(tmp_path_factory.mktemp("cmp_ref"))
    build_index(spark, spark.createDataFrame(pages, WEB_PAGES_SCHEMA),
                ref, n_chunks=2, n_buckets=8)
    r_ref = IndexReader(spark, ref)
    for q in QUERIES:
        a = [(r["url"], round(r["score"], 9)) for r in
             vector_topk(spark, reader, q, "bm25", k=10,
                         with_urls=True).collect()]
        b = [(r["url"], round(r["score"], 9)) for r in
             vector_topk(spark, r_ref, q, "bm25", k=10,
                         with_urls=True).collect()]
        assert a == b and a


def test_time_travel_reader(spark, tmp_path_factory):
    """Iceberg-style time travel: IndexReader/LocalSearcher opened
    ``at_version=N`` reproduce snapshot N's results bit-for-bit after
    later appends+refreshes; expired versions raise with the
    retained list."""
    from rechercheinfoweb_spark.operators.index_build import (
        list_snapshots,
    )
    out = str(tmp_path_factory.mktemp("tt_idx"))
    pages = synthetic_web_pages(spark, 120).collect()
    first = spark.createDataFrame(pages[:90], WEB_PAGES_SCHEMA)
    extra = spark.createDataFrame(pages[90:], WEB_PAGES_SCHEMA)
    build_index(spark, first, out, n_chunks=4, n_buckets=8)
    snaps = list_snapshots(out)
    assert len(snaps) == 1
    v1 = snaps[0]
    before = _snapshot(spark, IndexReader(spark, out))
    l_before = LocalSearcher(out).vector_query(QUERIES[0], "bm25",
                                               k=10)
    inc.append_batch(spark, extra, out, batch_id=1, n_buckets=8)
    inc.refresh(spark, out, n_buckets=8)
    assert list_snapshots(out) == [v1, v1 + 1]
    # the live reader sees the append ...
    assert IndexReader(spark, out).n_docs == 120
    # ... while time travel reproduces the pre-append snapshot
    old = IndexReader(spark, out, at_version=v1)
    assert old.n_docs == 90
    assert _snapshot(spark, old) == before
    assert LocalSearcher(out, at_version=v1).vector_query(
        QUERIES[0], "bm25", k=10) == l_before
    # at_version pinned to the CURRENT version equals the live view
    cur = IndexReader(spark, out, at_version=v1 + 1)
    assert _snapshot(spark, cur) == _snapshot(
        spark, IndexReader(spark, out))
    # the next refresh expires v1 (current + previous retention)
    inc.refresh(spark, out, n_buckets=8)
    assert v1 not in list_snapshots(out)
    with pytest.raises(ValueError, match="expired"):
        IndexReader(spark, out, at_version=v1)
    with pytest.raises(ValueError, match="expired"):
        LocalSearcher(out, at_version=v1)


def test_stream_with_auto_compaction(spark, tmp_path_factory):
    """compact_every bounds chunk count during unbounded ingestion
    while preserving exact batch-build equivalence."""
    from rechercheinfoweb_spark.operators.index_build import (
        build_index as _build,
    )

    n = 120
    src = str(tmp_path_factory.mktemp("ac_src"))
    pages = synthetic_web_pages(spark, n).collect()
    step = n // 4
    for i in range(4):
        spark.createDataFrame(pages[i * step:(i + 1) * step],
                              WEB_PAGES_SCHEMA) \
            .coalesce(1).write.parquet(f"{src}/b{i}")
    out = str(tmp_path_factory.mktemp("ac_idx"))
    ckpt = str(tmp_path_factory.mktemp("ac_ckpt"))
    stream = (spark.readStream.schema(WEB_PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*/"))
    q = inc.index_web_pages_stream(
        spark, stream, out, ckpt, n_buckets=8,
        refresh_every=1, compact_every=2, compact_target_docs=n)
    q.awaitTermination(300)
    inc.refresh(spark, out, n_buckets=8)

    reader = IndexReader(spark, out)
    assert reader.n_docs == n
    # 4 appended chunks collapsed by the two compaction cycles
    assert len(reader.salt_map) < 4
    ref = str(tmp_path_factory.mktemp("ac_ref"))
    _build(spark, spark.createDataFrame(pages, WEB_PAGES_SCHEMA),
           ref, n_chunks=2, n_buckets=8)
    r_ref = IndexReader(spark, ref)
    for query in QUERIES[:2]:
        a = [(r["url"], round(r["score"], 9)) for r in
             vector_topk(spark, reader, query, "bm25", k=10,
                         with_urls=True).collect()]
        b = [(r["url"], round(r["score"], 9)) for r in
             vector_topk(spark, r_ref, query, "bm25", k=10,
                         with_urls=True).collect()]
        assert a == b and a


def test_plan_groups_respects_target():
    rows = [{"chunk": i, "min_id": 1 + 20 * i, "n_docs": 20,
             "batch_id": None} for i in range(7)]
    groups = plan_groups(rows, target_docs=50)
    assert [len(g) for g in groups] == [2, 2, 2, 1]
    # chunks stay in doc-id order inside every group
    flat = [r["chunk"] for g in groups for r in g]
    assert flat == list(range(7))
    # an oversized chunk stays alone
    rows[3]["n_docs"] = 100
    groups = plan_groups(rows, target_docs=50)
    assert [r["chunk"] for r in groups[1]] == [2] or \
           [len(g) for g in groups][1] <= 2
    assert any(g == [rows[3]] for g in groups)


def test_compact_crash_publishes_atomically(spark, tmp_path_factory,
                                            monkeypatch):
    """A crash at compaction's commit point (the live corpus_stats
    write inside finalize) leaves readers on the pre-compaction
    snapshot — identical answers on every query surface — and a
    clean re-run converges to the same answers as an uncrashed
    compaction."""
    from rechercheinfoweb_spark.operators import index_build

    out = str(tmp_path_factory.mktemp("crash_idx"))
    pages = synthetic_web_pages(spark, N)
    build_index(spark, pages, out, n_chunks=8, n_buckets=8)
    before = _snapshot(spark, IndexReader(spark, out))
    n_chunks_before = len(read_registry(IndexPaths(out).chunks))

    live = IndexPaths(out).corpus_stats
    real = index_build._write_corpus_stats

    def crash_at_commit(path, **values):
        if path == live:
            raise RuntimeError("injected failure: compact commit")
        real(path, **values)

    monkeypatch.setattr(index_build, "_write_corpus_stats",
                        crash_at_commit)
    with pytest.raises(RuntimeError, match="injected"):
        compact_chunks(spark, out, target_docs=N // 2)
    # readers opened after the crash: old snapshot, bit-identical
    assert _snapshot(spark, IndexReader(spark, out)) == before

    # re-run: the interrupted compaction is detected (published
    # chunks already replaced in the working registry) and its
    # pending publish COMPLETES — re-merging here would double every
    # replaced chunk (the bug this test originally caught)
    monkeypatch.setattr(index_build, "_write_corpus_stats", real)
    info = compact_chunks(spark, out, target_docs=N // 2)
    assert info.get("resumed_publish") is True
    after_reader = IndexReader(spark, out)
    assert _snapshot(spark, after_reader) == before
    assert len(after_reader.salt_map) < n_chunks_before
    # and the index is stable: one more compact is a plain no-op
    again = compact_chunks(spark, out, target_docs=N // 2)
    assert again["merged_groups"] == 0
    assert "resumed_publish" not in again
    assert _snapshot(spark, IndexReader(spark, out)) == before
