"""Incremental index ingestion — Structured Streaming over web_pages.

The reference is batch-only (SURVEY.md §2.7: build once, serve); this
module is the scale-path extension the Spark architecture buys for
free: because the batch build already materializes the index as
immutable per-(bucket, salt) posting files plus a chunk registry
(operators/index_build.py), a streaming micro-batch of new pages is
simply *the next chunk*:

  foreachBatch(batch) →
      assign ids [max_id+1 ..] (url order within the batch),
      tokenize + pack with the SAME kernels as the batch build,
      write docs/chunk=c + postings/bucket=*/salt=c (final v4
      blocks — immutable, never rewritten),
      atomically replace the chunk registry with the appended row,
      write a per-batch manifest (lineage + docs/sec).

Queries keep working against the last finalized snapshot while
batches accumulate (readers pin the registry snapshot corpus_stats
references and filter new salts out); :func:`refresh` re-runs the
shared ``finalize_index``, which under layout v4 is METADATA-ONLY — two
small aggregations rebuilding the dictionary (global df) and
corpus_stats — because scheme weights are computed at query time.
No posting bytes are ever rewritten; a refresh costs seconds at any
index size, so it can run per batch instead of on a reluctant
cadence.  Long-running ingestion bounds its chunk count (and with it
per-query shard fan-out) with :func:`..operators.compact.
compact_chunks` on whatever cadence fits — compaction cost is
proportional to the chunks merged, not the index.

Exactly-once: Structured Streaming's checkpoint (WAL + committed
offsets) guarantees each micro-batch is delivered once to
foreachBatch; the append itself is idempotent per ``batch_id``
through two commit markers checked on replay-after-crash:

  1. the batch manifest (written last);
  2. the registry row's ``batch_id`` column (written atomically via
     tmp-file + os.replace BEFORE the manifest).

A crash before the registry write replays into the same chunk id
(dynamic partition overwrite — idempotent); a crash between registry
and manifest is reconciled by the registry's batch_id (the batch is
NOT re-appended; only the missing manifest is rewritten).  The
atomic file replace also removes the delete-then-write window in
which a crash could lose the registry entirely.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions import codec
from ..functions.tokenizer import STOPWORDS
from ..operators.index_build import (
    DOC_STATS_SCHEMA, POSTINGS_SCHEMA, TERM_ROWS_SCHEMA,
    IndexPaths,
    _doc_stats_kernel, _pack_postings_kernel, _tokenize_counts_kernel,
    finalize_index, read_registry, stemmed_of, term_bucket,
    write_registry,
)
from ..plans.checkpoints import read_manifest, write_manifest


def _index_n_buckets(paths: IndexPaths, default: int) -> int:
    """The append MUST bucket terms exactly like the existing index
    (bucket is a physical partition dir); read it from corpus_stats
    when the index has been finalized at least once."""
    import pyarrow.parquet as pq
    if os.path.exists(paths.corpus_stats):
        return int(pq.read_table(
            paths.corpus_stats).to_pylist()[0]["n_buckets"])
    return default


def append_batch(spark: SparkSession, batch_df: DataFrame,
                 out_dir: str, batch_id: int | None = None, *,
                 n_buckets: int = 16,
                 block_size: int = codec.DEFAULT_BLOCK,
                 stopwords: frozenset[str] = STOPWORDS) -> dict | None:
    """Append one micro-batch of web_pages as a new chunk.

    Ids continue from the registry's max (url order within the
    batch — deterministic given the batch content).  Idempotent per
    batch_id: a replayed batch whose manifest OR registry row exists
    is skipped (see module docstring for the crash-window analysis).
    """
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    reg = read_registry(paths.chunks)
    name = None
    if batch_id is not None:
        name = f"stream-batch-{batch_id:06d}"
        if read_manifest(out_dir, name) is not None:
            return None  # replay after crash — already applied
        applied = [r for r in reg if r.get("batch_id") == batch_id]
        if applied:
            # crash landed between registry commit and manifest:
            # reconcile by (re)writing the manifest only
            r = applied[0]
            write_manifest(out_dir, name, {
                "chunk": r["chunk"], "batch_id": batch_id,
                "n_docs": r["n_docs"], "first_doc_id": r["min_id"],
                "reconciled": True,
                "lineage": {"stage": "stream-append",
                            "chunk": r["chunk"],
                            "op": "reconcile-after-crash"},
            })
            return None
    ts = time.time()
    n_buckets = _index_n_buckets(paths, n_buckets)
    # appended chunks MUST tokenize exactly like the existing index
    use_stem = bool(stemmed_of(paths))
    next_chunk = (max(r["chunk"] for r in reg) + 1) if reg else 0
    # span, not n_docs: after a physical delete purge a chunk's live
    # count shrinks but its id RANGE does not — new ids must start
    # above every id ever assigned or they would collide with holes
    next_id = (max(r["min_id"] + r.get("span", r["n_docs"])
                   for r in reg)) if reg else 1

    # batch-local id assignment: batches are bounded (micro-batch
    # sized), so a single-partition url sort is fine here; the
    # distributed two-phase numbering stays in the batch build path
    staged = (batch_df
              .withColumn("doc_id",
                          F.row_number().over(Window.orderBy("url"))
                          + F.lit(next_id - 1))
              .withColumn("chunk", F.lit(next_chunk).cast("int"))
              .select("doc_id", "chunk", "url", "text", "lang"))

    par = spark.sparkContext.defaultParallelism
    staged = staged.persist()  # micro-batch sized: safe to cache
    (staged.select("doc_id", "chunk", "url", "lang", "text")
     .repartition(par, "doc_id")
     .mapInPandas(_doc_stats_kernel(stopwords, use_stem),
                  schema=DOC_STATS_SCHEMA)
     .write.partitionBy("chunk")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(paths.docs))
    (staged.select("doc_id", "chunk", "text")
     .repartition(par, "doc_id")
     .mapInPandas(_tokenize_counts_kernel(stopwords,
                                         use_stem=use_stem),
                  schema=TERM_ROWS_SCHEMA)
     .withColumn("tbucket", term_bucket(F.col("term"), n_buckets))
     .groupBy("chunk", "tbucket")
     .applyInArrow(_pack_postings_kernel(block_size),
                   schema=POSTINGS_SCHEMA)
     .write.partitionBy("bucket", "salt")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(paths.postings))
    staged.unpersist()

    n_batch = spark.read.parquet(
        os.path.join(paths.docs, f"chunk={next_chunk}")).count()
    # registry commit: atomic single-file replace (os.replace), with
    # batch_id recorded as the idempotency marker
    write_registry(paths.chunks, reg + [
        {"chunk": next_chunk, "min_id": next_id, "n_docs": n_batch,
         "batch_id": batch_id}])

    wall = time.time() - ts
    info = {
        "chunk": next_chunk, "batch_id": batch_id, "n_docs": n_batch,
        "first_doc_id": next_id, "wall_secs": wall,
        "docs_per_sec": n_batch / wall if wall > 0 else None,
        "lineage": {"stage": "stream-append", "chunk": next_chunk,
                    "op": "tokenize+count+block-pack",
                    "block_size": block_size,
                    "n_buckets": n_buckets},
    }
    if name is not None:
        write_manifest(out_dir, name, info)
    return info


def refresh(spark: SparkSession, out_dir: str, *,
            n_buckets: int = 16,
            block_size: int = codec.DEFAULT_BLOCK) -> dict:
    """Publish all appended chunks to queries: rebuild the dictionary
    (global df) + corpus_stats and bump max_chunk.  Metadata-only
    under layout v4 — posting bytes are untouched."""
    paths = IndexPaths(out_dir)
    return finalize_index(spark, out_dir,
                          n_buckets=_index_n_buckets(paths, n_buckets),
                          block_size=block_size)


def index_web_pages_stream(spark: SparkSession, stream_df: DataFrame,
                           out_dir: str, checkpoint_dir: str, *,
                           refresh_every: int | None = None,
                           compact_every: int | None = None,
                           compact_target_docs: int | None = None,
                           n_buckets: int = 16,
                           trigger: dict | None = None):
    """Start the incremental ingestion stream.

    ``stream_df``: a streaming DataFrame with the web_pages schema
    (e.g. ``spark.readStream.schema(...).parquet(dir)`` or a Kafka
    source mapped to it).  With ``refresh_every=k`` the postings
    snapshot refreshes after every k-th micro-batch (else call
    :func:`refresh` on your own cadence — cheap either way, see
    module docstring).  With ``compact_every=m`` every m-th applied
    batch also runs :func:`..operators.compact.compact_chunks`
    (which refreshes as its publish step) — unbounded ingestion then
    holds chunk count, and with it per-query shard fan-out, at a
    constant instead of one chunk per micro-batch forever.
    """
    from ..operators.compact import compact_chunks
    from ..operators.index_build import DOCS_PER_CHUNK

    n_seen = {"batches": 0}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        info = append_batch(spark, batch_df, out_dir, batch_id,
                            n_buckets=n_buckets)
        if info is None:
            return
        n_seen["batches"] += 1
        if refresh_every and n_seen["batches"] % refresh_every == 0:
            refresh(spark, out_dir, n_buckets=n_buckets)
        if compact_every and n_seen["batches"] % compact_every == 0:
            compact_chunks(
                spark, out_dir,
                target_docs=compact_target_docs or DOCS_PER_CHUNK)

    writer = (stream_df.writeStream
              .option("checkpointLocation", checkpoint_dir)
              .foreachBatch(handle))
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
