"""Incremental index ingestion — Structured Streaming over web_pages.

The reference is batch-only (SURVEY.md §2.7: build once, serve); this
module is the scale-path extension the Spark architecture buys for
free: because the batch build already materializes the index as
immutable per-chunk segment files plus a chunk registry
(operators/index_build.py), a streaming micro-batch of new pages is
simply *the next chunk*:

  foreachBatch(batch) →
      assign ids [max_id+1 ..] (url order within the batch),
      tokenize + pack with the SAME kernels as the batch build,
      write docs/chunk=c + segments/chunk=c,
      append (c, min_id, n_docs) to the chunk registry,
      write a per-batch manifest (lineage + docs/sec).

Queries keep working against the last finalized snapshot while
batches accumulate; :func:`refresh` re-runs the shared
``finalize_index`` to fold all appended segments into a new queryable
postings snapshot (idf/avgdl are global statistics, so the refresh
rewrites weights — the Lucene-style segment-merge moment; at
Common-Crawl scale you run it on a cadence, not per batch).

Exactly-once: Structured Streaming's checkpoint (WAL + committed
offsets) guarantees each micro-batch is delivered once to
foreachBatch; the append itself is idempotent per ``batch_id`` (a
batch manifest present ⇒ the batch is skipped on replay-after-crash).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions import codec
from ..functions.tokenizer import STOPWORDS
from ..operators.index_build import (
    DOC_STATS_SCHEMA, SEGMENT_BLOCK, SEGMENT_SCHEMA, TERM_ROWS_SCHEMA,
    IndexPaths,
    _doc_stats_kernel, _pack_segments_kernel, _tokenize_counts_kernel,
    finalize_index, term_bucket,
)
from ..plans.checkpoints import read_manifest, write_manifest


def _registry(spark: SparkSession, paths: IndexPaths):
    if not os.path.exists(paths.chunks):
        return []
    return sorted(
        (r["chunk"], r["min_id"], r["n_docs"])
        for r in spark.read.parquet(paths.chunks).collect())


def append_batch(spark: SparkSession, batch_df: DataFrame,
                 out_dir: str, batch_id: int | None = None, *,
                 block_size: int = codec.DEFAULT_BLOCK,
                 stopwords: frozenset[str] = STOPWORDS) -> dict | None:
    """Append one micro-batch of web_pages as a new chunk.

    Ids continue from the registry's max (url order within the
    batch — deterministic given the batch content).  Idempotent per
    batch_id: a replayed batch whose manifest exists is skipped."""
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    name = None
    if batch_id is not None:
        name = f"stream-batch-{batch_id:06d}"
        if read_manifest(out_dir, name) is not None:
            return None  # replay after crash — already applied
    ts = time.time()
    reg = _registry(spark, paths)
    next_chunk = (max(c for c, _, _ in reg) + 1) if reg else 0
    next_id = (max(m + n for _, m, n in reg)) if reg else 1

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
     .mapInPandas(_doc_stats_kernel(stopwords),
                  schema=DOC_STATS_SCHEMA)
     .write.partitionBy("chunk")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(paths.docs))
    (staged.select("doc_id", "chunk", "text")
     .repartition(par, "doc_id")
     .mapInPandas(_tokenize_counts_kernel(stopwords),
                  schema=TERM_ROWS_SCHEMA)
     .withColumn("tbucket", term_bucket(F.col("term"), 32))
     .groupBy("chunk", "tbucket")
     .applyInPandas(_pack_segments_kernel(SEGMENT_BLOCK),
                    schema=SEGMENT_SCHEMA)
     .write.partitionBy("chunk")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(paths.segments))
    staged.unpersist()

    n_batch = spark.read.parquet(
        os.path.join(paths.docs, f"chunk={next_chunk}")).count()
    # registry append: rewrite the (tiny) registry table atomically
    rows = reg + [(next_chunk, next_id, n_batch)]
    (spark.createDataFrame(rows, "chunk int, min_id long, n_docs long")
     .coalesce(1).write.mode("overwrite").parquet(paths.chunks))

    wall = time.time() - ts
    info = {
        "chunk": next_chunk, "batch_id": batch_id, "n_docs": n_batch,
        "first_doc_id": next_id, "wall_secs": wall,
        "docs_per_sec": n_batch / wall if wall > 0 else None,
        "lineage": {"stage": "stream-append", "chunk": next_chunk,
                    "op": "tokenize+count+segment-pack",
                    "block_size": block_size},
    }
    if name is not None:
        write_manifest(out_dir, name, info)
    return info


def refresh(spark: SparkSession, out_dir: str, *,
            n_buckets: int = 16,
            block_size: int = codec.DEFAULT_BLOCK) -> dict:
    """Fold all appended chunks into a queryable postings snapshot."""
    return finalize_index(spark, out_dir, n_buckets=n_buckets,
                          block_size=block_size)


def index_web_pages_stream(spark: SparkSession, stream_df: DataFrame,
                           out_dir: str, checkpoint_dir: str, *,
                           refresh_every: int | None = None,
                           n_buckets: int = 16,
                           trigger: dict | None = None):
    """Start the incremental ingestion stream.

    ``stream_df``: a streaming DataFrame with the web_pages schema
    (e.g. ``spark.readStream.schema(...).parquet(dir)`` or a Kafka
    source mapped to it).  With ``refresh_every=k`` the postings
    snapshot refreshes after every k-th micro-batch (else call
    :func:`refresh` on your own cadence).
    """
    n_seen = {"batches": 0}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        info = append_batch(spark, batch_df, out_dir, batch_id)
        if info is None:
            return
        n_seen["batches"] += 1
        if refresh_every and n_seen["batches"] % refresh_every == 0:
            refresh(spark, out_dir, n_buckets=n_buckets)

    writer = (stream_df.writeStream
              .option("checkpointLocation", checkpoint_dir)
              .foreachBatch(handle))
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
