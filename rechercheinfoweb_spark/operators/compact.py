"""Chunk compaction — LSM-style segment merge for the posting store.

The streaming path (streaming/incremental.py) appends each
micro-batch as its own chunk, so a long-lived index accumulates one
``salt=c`` postings partition and one ``docs/chunk=c`` directory per
batch.  Correctness never degrades (readers union all snapshot
chunks), but per-query cost does: every term carries one posting row
per chunk it appears in, the score stage runs one ``applyInPandas``
group per chunk, and the parquet scan lists one directory per
(bucket, chunk).  At 10^12 docs with micro-batch appends that is the
classic LSM problem, and this module is the classic answer: merge
runs of small adjacent chunks into one.

Why the merge is cheap — a layout-v4 design dividend: every posting
block's delta chain is independent (it cumsums to ABSOLUTE doc ids;
codec.pack_postings), and chunks are disjoint contiguous doc-id
ranges.  Merging chunks is therefore pure block-LIST concatenation in
doc-id order: not a single varint is re-encoded, block-max metadata
stays valid, and scores are bit-identical by construction (the score
kernel accumulates per term in sorted order either way).  Only the
grouping row (term, salt, blocks[]) is rewritten.

Snapshot discipline (shared with finalize): merged chunks take FRESH
ids, the working registry is replaced atomically, and the new chunk
set reaches readers only through ``finalize_index``'s atomic
(dictionary, registry-snapshot, corpus_stats) publish.  Readers
opened before compaction keep scoring the OLD chunk dirs — pruning
retains every chunk referenced by the current or previous snapshot,
exactly the live-reader grace the dictionary versions already get.

Crash analysis: a crash before the registry replace leaves orphan
``salt=new`` dirs that the next compaction run deterministically
overwrites (same fresh ids, dynamic partition overwrite); a crash
between registry replace and finalize leaves readers pinned to the
old snapshot — re-running compaction (or just finalize) completes the
publish.  No window loses data or mixes snapshots.

Scale shape: compaction reads and writes ONLY the chunks it merges —
one shuffle over their postings (term rows hash to their merged
group) and one narrow rewrite of their docs rows.  Cost is
proportional to the merged span, never to the index, so a background
compactor can run on whatever cadence bounds chunk count.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
from pyspark.sql import SparkSession, functions as F

from ..plans.checkpoints import write_manifest
from .index_build import (
    DOC_STATS_SCHEMA, DOCS_PER_CHUNK, POSTINGS_SCHEMA, IndexPaths,
    check_layout, dict_version_of, finalize_index, read_registry,
    snapshot_registry, write_registry,
)


def _merge_postings_kernel():
    """applyInPandas kernel over one (bucket, new_salt) group: all
    posting rows of the chunks being merged into ``new_salt``.  Per
    term: blocks concatenate in doc-id order (min_doc_id of the
    source row — chunk ranges are disjoint), df_part sums,
    min_doc_id mins.  Block bytes are NOT touched."""

    def fn(pdf):
        import pandas as pd
        bucket = int(pdf["bucket"].iloc[0])
        new_salt = int(pdf["new_salt"].iloc[0])
        pdf = pdf.sort_values(["term", "min_doc_id"], kind="mergesort")
        terms: list = []
        dfp: list = []
        minid: list = []
        blocks: list = []
        for term, g in pdf.groupby("term", sort=False):
            terms.append(term)
            dfp.append(int(g["df_part"].sum()))
            minid.append(int(g["min_doc_id"].iloc[0]))
            blocks.append([b for lst in g["blocks"] for b in lst])
        return pd.DataFrame({
            "term": terms,
            "bucket": np.full(len(terms), bucket, dtype=np.int32),
            "salt": np.full(len(terms), new_salt, dtype=np.int32),
            "df_part": np.asarray(dfp, dtype=np.int64),
            "min_doc_id": np.asarray(minid, dtype=np.int64),
            "blocks": blocks,
        })

    return fn


def plan_groups(published: list[dict], target_docs: int
                ) -> list[list[dict]]:
    """Greedy left-to-right grouping of the published chunks (in
    doc-id order) into runs of total size <= target_docs.  A chunk
    already >= target stays alone.  Only runs of >= 2 chunks are
    merge work."""
    rows = sorted(published, key=lambda r: r["min_id"])
    groups: list[list[dict]] = []
    cur: list[dict] = []
    cur_docs = 0
    for r in rows:
        if cur and cur_docs + r["n_docs"] > target_docs:
            groups.append(cur)
            cur, cur_docs = [], 0
        cur.append(r)
        cur_docs += r["n_docs"]
    if cur:
        groups.append(cur)
    return groups


def _prune_unreferenced_chunks(paths: IndexPaths,
                               keep: set[int]) -> list[int]:
    """Delete postings salt dirs + docs chunk dirs for chunks in no
    live snapshot (current, previous, or working registry)."""
    pruned: set[int] = set()
    if os.path.isdir(paths.postings):
        for bdir in os.listdir(paths.postings):
            bpath = os.path.join(paths.postings, bdir)
            if not (bdir.startswith("bucket=") and os.path.isdir(bpath)):
                continue
            for sdir in os.listdir(bpath):
                if sdir.startswith("salt=") and sdir[5:].lstrip("-") \
                        .isdigit() and int(sdir[5:]) not in keep:
                    shutil.rmtree(os.path.join(bpath, sdir),
                                  ignore_errors=True)
                    pruned.add(int(sdir[5:]))
    if os.path.isdir(paths.docs):
        for cdir in os.listdir(paths.docs):
            if cdir.startswith("chunk=") and cdir[6:].lstrip("-") \
                    .isdigit() and int(cdir[6:]) not in keep:
                shutil.rmtree(os.path.join(paths.docs, cdir),
                              ignore_errors=True)
                pruned.add(int(cdir[6:]))
    return sorted(pruned)


def compact_chunks(spark: SparkSession, out_dir: str, *,
                   target_docs: int = DOCS_PER_CHUNK,
                   prune: bool = True,
                   keep_previous: bool = True) -> dict:
    """Merge runs of adjacent published chunks up to ``target_docs``
    docs each, publish the new snapshot, prune unreferenced dirs.

    Returns a summary dict; ``merged_groups == 0`` means the chunk
    layout was already within target (no-op, nothing written).
    ``target_docs`` doubles as the per-shard memory bound the query
    kernels rely on (dense arrays are O(chunk size)), so the default
    matches the build's DOCS_PER_CHUNK.

    ``keep_previous`` (default) retains the pre-compaction chunk dirs
    for readers opened before this run (they are pruned by the NEXT
    compaction, once their snapshot ages out) — the same
    current+previous grace the dictionary versions get.  Pass False
    to reclaim the space immediately when no long-lived readers exist
    (Iceberg's expire-snapshots trade-off)."""
    import pyarrow.parquet as pq

    t0 = time.time()
    paths = IndexPaths(out_dir)
    if not os.path.exists(paths.corpus_stats):
        # never finalized: nothing is published, nothing to merge
        return {"merged_groups": 0, "n_chunks_before": 0,
                "n_chunks_after": 0, "wall_secs": 0.0}
    stats = pq.read_table(paths.corpus_stats).to_pylist()[0]
    check_layout(stats)
    working = read_registry(paths.chunks)
    published = snapshot_registry(paths, stats)
    published_ids = {r["chunk"] for r in published}

    groups = plan_groups(published, target_docs)
    merge_groups = [g for g in groups if len(g) >= 2]
    if not merge_groups:
        return {"merged_groups": 0, "n_chunks_before": len(published),
                "n_chunks_after": len(published), "wall_secs": 0.0}

    next_id = max(r["chunk"] for r in working) + 1
    mapping: dict[int, int] = {}
    merged_rows: list[dict] = []
    for i, g in enumerate(merge_groups):
        new_id = next_id + i
        for r in g:
            mapping[r["chunk"]] = new_id
        merged_rows.append({
            "chunk": new_id,
            "min_id": min(r["min_id"] for r in g),
            "n_docs": sum(r["n_docs"] for r in g),
            "batch_id": None,
        })

    old_ids = sorted(mapping)
    map_expr = F.create_map(*[F.lit(x) for kv in mapping.items()
                              for x in kv])

    # postings: one shuffle over the merged chunks' rows only; block
    # bytes ride through untouched (list concat in the kernel)
    (spark.read.parquet(paths.postings)
     .where(F.col("salt").isin(old_ids))
     .withColumn("new_salt", F.element_at(map_expr, F.col("salt")))
     .select("term", "bucket", "new_salt", "df_part", "min_doc_id",
             "blocks")
     .groupBy("bucket", "new_salt")
     .applyInPandas(_merge_postings_kernel(), schema=POSTINGS_SCHEMA)
     .write.partitionBy("bucket", "salt")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(paths.postings))

    # docs: narrow rewrite of the merged chunks' rows under their new
    # chunk id
    (spark.read.option("basePath", paths.docs)
     .parquet(*[os.path.join(paths.docs, f"chunk={c}")
                for c in old_ids])
     .withColumn("chunk",
                 F.element_at(map_expr, F.col("chunk")).cast("int"))
     .select(*DOC_STATS_SCHEMA.fieldNames())
     .write.partitionBy("chunk")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(paths.docs))

    # working-registry commit (atomic file replace): merged rows in,
    # source rows out; unpublished appended chunks ride along
    # untouched
    survivors = [r for r in working if r["chunk"] not in mapping]
    write_registry(paths.chunks, survivors + merged_rows)

    # publish: atomic (dictionary, registry snapshot, corpus_stats)
    fin = finalize_index(spark, out_dir,
                         n_buckets=int(stats["n_buckets"]),
                         block_size=int(stats["block_size"]),
                         k1=float(stats["k1"]), b=float(stats["b"]))

    pruned: list[int] = []
    if prune:
        keep = {r["chunk"] for r in read_registry(paths.chunks)}
        keep.update(r["chunk"] for r in snapshot_registry(
            paths, pq.read_table(paths.corpus_stats).to_pylist()[0]))
        prev = paths.chunks_version(dict_version_of(stats))
        if keep_previous and os.path.exists(prev):
            # pre-compaction snapshot: readers opened before this run
            keep.update(r["chunk"] for r in read_registry(prev))
        pruned = _prune_unreferenced_chunks(paths, keep)

    wall = time.time() - t0
    info = {
        "merged_groups": len(merge_groups),
        "n_chunks_before": len(published),
        "n_chunks_after": len(published) - len(mapping)
        + len(merge_groups),
        "merged_chunks": old_ids,
        "new_chunks": [r["chunk"] for r in merged_rows],
        "pruned_chunks": pruned,
        "dict_version": fin["dict_version"],
        "wall_secs": wall,
    }
    write_manifest(out_dir, f"compact-{fin['dict_version']:06d}", {
        **info,
        "lineage": {"stage": "compact", "op": "chunk-merge",
                    "target_docs": target_docs,
                    "published_ids": sorted(published_ids)},
    })
    return info
