"""Distributed inverted-index build (SURVEY.md §3.1 Spark lifecycle).

Reference dataflow (Go, single machine, in-RAM trie): scan → tokenize
→ filter → stem → per-doc count → trie insert w/ tf weights → global
IDF scale → serialize (main.go:30-47, lexer.go:39-97, trie.go:46-198,
encoder.go:23-42).  Our job re-expresses it as three resumable Spark
stages over the ``web_pages`` input table:

stage 0  **stage**     assign deterministic docIDs (url order), split
                       into ``n_chunks`` doc partitions, snapshot as
                       parquet partitioned by ``chunk``.
stage 1  **chunk c**   (one per chunk, independently resumable)
                       tokenize+count via one Arrow kernel (no
                       explode/groupBy shuffle for per-doc counts —
                       docs never span partitions, so A1/A2/A3 are
                       map-side), then shuffle by ``term`` once and
                       pack *segment* posting blocks (delta+varint
                       docIDs, tf, dl, max_tf).  Writes
                       ``segments/chunk=c`` + ``docs/chunk=c``.
stage 2  **finalize**  global df/idf/avgdl (small aggregations),
                       rewrite segment blocks into *final* blocks
                       with the four precomputed weights + block-max
                       metadata, write ``postings`` partitioned by
                       ``bucket(term)`` + ``corpus_stats``.

Skew: a df≈N hot term never concentrates — its postings are split
across chunks by construction (salt = chunk id), and the final index
keeps one row per (term, chunk), so no reducer ever sees a whole hot
posting list.  This is the salted-key two-phase aggregation the north
rule mandates; ``n_chunks`` is the salt fan-out knob.

Scale notes: at 10^12 docs the same plan holds — stage 0 is the only
global pass (two-phase zipWithIndex numbering, no single-partition
sort); each chunk shuffles only its own doc range by term; finalize's
df aggregation is |vocab|-sized, and its block rewrite is
embarrassingly parallel (mapInPandas over (term, chunk) rows whose
size is bounded by the chunk size).
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType,
    StringType, StructField, StructType,
)

from ..functions import codec, scoring
from ..functions.tokenizer import STOPWORDS, TOKEN_RE, index_tokens
from ..plans.checkpoints import (
    read_manifest, stage_complete, write_manifest,
)
from ..sources.web_pages import assign_doc_ids

# bump when the on-disk index layout changes incompatibly
# (v2: range chunking + chunk registry; v3: url_map replaces the
# staged corpus copy)
INDEX_LAYOUT_VERSION = 3

# Segment blocks are an intermediate (finalize concatenates them and
# re-blocks at the query block size), so fine WAND granularity buys
# nothing there while per-block numpy overhead dominates — use large
# blocks, bounded only to keep parquet cells reasonable.
SEGMENT_BLOCK = 65536

BLOCK_TYPE = StructType([
    StructField("first_doc_id", LongType(), False),
    StructField("n", IntegerType(), False),
    StructField("max_w_raw", DoubleType(), False),
    StructField("max_w_norm", DoubleType(), False),
    StructField("max_w_half", DoubleType(), False),
    StructField("max_bm25", DoubleType(), False),
    StructField("data", BinaryType(), False),
])

TERM_ROWS_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("chunk", IntegerType(), False),
    StructField("term", StringType(), False),
    StructField("tf", LongType(), False),
    StructField("dl", LongType(), False),
    StructField("max_tf", LongType(), False),
])

DOC_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("chunk", IntegerType(), False),
    StructField("url", StringType(), False),
    StructField("lang", StringType(), True),
    StructField("dl", LongType(), False),
    StructField("max_tf", LongType(), False),
    StructField("n_raw", LongType(), False),
])

SEGMENT_SCHEMA = StructType([
    StructField("term", StringType(), False),
    StructField("chunk", IntegerType(), False),
    StructField("df_part", LongType(), False),
    StructField("blocks", ArrayType(BLOCK_TYPE), False),
])

POSTINGS_SCHEMA = StructType([
    StructField("term", StringType(), False),
    StructField("salt", IntegerType(), False),
    StructField("df", LongType(), False),
    StructField("idf", DoubleType(), False),
    StructField("bm25_idf", DoubleType(), False),
    StructField("blocks", ArrayType(BLOCK_TYPE), False),
])


@dataclass
class IndexPaths:
    out_dir: str

    @property
    def url_map(self) -> str: return os.path.join(self.out_dir, "url_map")
    @property
    def docs(self) -> str: return os.path.join(self.out_dir, "docs")
    @property
    def segments(self) -> str: return os.path.join(self.out_dir, "segments")
    @property
    def postings(self) -> str: return os.path.join(self.out_dir, "postings")
    @property
    def corpus_stats(self) -> str:
        return os.path.join(self.out_dir, "corpus_stats")
    @property
    def term_rows(self) -> str:
        return os.path.join(self.out_dir, "term_rows")
    @property
    def chunks(self) -> str:
        return os.path.join(self.out_dir, "chunks")


@dataclass
class BuildResult:
    paths: IndexPaths
    n_docs: int
    wall_secs: float
    docs_per_sec: float
    stage_secs: dict = field(default_factory=dict)
    resumed_stages: list = field(default_factory=list)


def _tokenize_counts_kernel(stopwords: frozenset[str],
                            block_rows: int = 65536):
    """mapInPandas kernel: (doc_id, chunk, text) → per-(doc, term)
    tf rows — the inverted-index transpose feed.

    Tokenize compute is ~0.2 ms/doc; the expensive part of stage 1
    is moving the ~140 term rows per doc through Arrow and the term
    shuffle, so this kernel emits the minimal row (48B fixed + term)
    in large frames (Arrow per-batch overhead amortized)."""

    def fn(batches):
        import pandas as pd
        from collections import Counter

        def flush(terms, tfs, doc_meta):
            meta = np.asarray(doc_meta, dtype=np.int64)
            reps = meta[:, 4]
            return pd.DataFrame({
                "doc_id": np.repeat(meta[:, 0], reps),
                "chunk": np.repeat(meta[:, 1], reps).astype(np.int32),
                "term": terms,
                "tf": np.asarray(tfs, dtype=np.int64),
                "dl": np.repeat(meta[:, 2], reps),
                "max_tf": np.repeat(meta[:, 3], reps),
            })

        for pdf in batches:
            terms: list = []
            tfs: list = []
            doc_meta: list = []  # (doc_id, chunk, dl, max_tf, n_terms)
            for doc_id, chunk, text in zip(
                    pdf["doc_id"].tolist(), pdf["chunk"].tolist(),
                    pdf["text"].tolist()):
                counts = Counter(index_tokens_from_raw(
                    TOKEN_RE.findall(text or ""), stopwords))
                vals = counts.values()
                terms.extend(counts.keys())
                tfs.extend(vals)
                doc_meta.append((doc_id, chunk, sum(vals),
                                 max(vals) if counts else 0,
                                 len(counts)))
                if len(terms) >= block_rows:
                    yield flush(terms, tfs, doc_meta)
                    terms, tfs, doc_meta = [], [], []
            if terms:
                yield flush(terms, tfs, doc_meta)

    return fn


def _doc_stats_kernel(stopwords: frozenset[str]):
    """mapInPandas kernel: (doc_id, chunk, url, lang, text) → ONE
    stats row per doc (the docs dimension).  Runs tokenize a second
    time instead of materializing the 140×-larger term-row stream —
    recompute is ~50× cheaper than the extra write+read."""

    def fn(batches):
        import pandas as pd
        from collections import Counter
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "chunk", "url", "lang",
                                   "dl", "max_tf", "n_raw")}
            for doc_id, chunk, url, lang, text in zip(
                    pdf["doc_id"].tolist(), pdf["chunk"].tolist(),
                    pdf["url"].tolist(), pdf["lang"].tolist(),
                    pdf["text"].tolist()):
                raw = TOKEN_RE.findall(text or "")
                counts = Counter(index_tokens_from_raw(raw, stopwords))
                out["doc_id"].append(doc_id)
                out["chunk"].append(chunk)
                out["url"].append(url)
                out["lang"].append(lang)
                out["dl"].append(sum(counts.values()))
                out["max_tf"].append(
                    max(counts.values()) if counts else 0)
                out["n_raw"].append(len(raw))
            yield pd.DataFrame(out)

    return fn


def index_tokens_from_raw(raw: list[str], stopwords: frozenset[str]
                          ) -> list[str]:
    from ..functions.porter2 import stem
    out = []
    for tok in raw:
        if len(tok) < 3 or tok in stopwords:
            continue
        out.append(stem(tok) if len(tok) >= 4 else tok)
    return out


def _pack_segments_kernel(block_size: int):
    """applyInPandas kernel over a (chunk, term-BUCKET) group → one
    segment row per term in the bucket.

    Grouping by (chunk, term) directly costs a pandas round-trip per
    term — ~0.5 ms x |vocab| x n_chunks dominates stage 1 and
    explodes on realistic web vocabularies.  Grouping by the term's
    postings bucket gives n_chunks x n_buckets LARGE groups; term
    boundaries are then numpy slices on the sorted group."""

    def fn(pdf):
        import pandas as pd
        pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        terms = pdf["term"].to_numpy()
        ids = pdf["doc_id"].to_numpy()
        tfs = pdf["tf"].to_numpy()
        dls = pdf["dl"].to_numpy()
        mtfs = pdf["max_tf"].to_numpy()
        chunk = int(pdf["chunk"].iloc[0])
        uniq, starts = np.unique(terms, return_index=True)
        bounds = np.append(starts, terms.size)
        out = {"term": [], "chunk": [], "df_part": [], "blocks": []}
        for i, term in enumerate(uniq):
            lo, hi = bounds[i], bounds[i + 1]
            out["term"].append(term)
            out["chunk"].append(chunk)
            out["df_part"].append(int(hi - lo))
            out["blocks"].append(codec.pack_segment_postings(
                ids[lo:hi], tfs[lo:hi], dls[lo:hi], mtfs[lo:hi],
                block_size=block_size))
        return pd.DataFrame(out)

    return fn


def _finalize_kernel(n_docs: int, avgdl: float, block_size: int,
                     k1: float, b: float):
    """mapInPandas kernel: segment rows (+ global df) → final rows."""

    def fn(batches):
        import pandas as pd
        for pdf in batches:
            rows = {k: [] for k in
                    ("term", "salt", "df", "idf", "bm25_idf", "blocks")}
            for term, chunk, blocks, df in zip(
                    pdf["term"], pdf["chunk"], pdf["blocks"], pdf["df"]):
                idf_v = float(scoring.idf(n_docs, df))
                bidf_v = float(scoring.bm25_idf(n_docs, df))
                ids_l, tfs_l, dls_l, mtfs_l = [], [], [], []
                for blk in blocks:
                    i, t, d, m = codec.unpack_segment_block(
                        bytes(blk["data"]), int(blk["n"]))
                    ids_l.append(i); tfs_l.append(t)
                    dls_l.append(d); mtfs_l.append(m)
                ids = np.concatenate(ids_l)
                tfs = np.concatenate(tfs_l)
                dls = np.concatenate(dls_l)
                mtfs = np.concatenate(mtfs_l)
                w = scoring.posting_weights(
                    tfs, dls, mtfs, idf_v, bidf_v, avgdl, k1, b)
                rows["term"].append(term)
                rows["salt"].append(int(chunk))
                rows["df"].append(int(df))
                rows["idf"].append(idf_v)
                rows["bm25_idf"].append(bidf_v)
                rows["blocks"].append(codec.pack_final_postings(
                    ids, tfs, w, block_size=block_size))
            yield pd.DataFrame(rows)

    return fn


def finalize_index(spark: SparkSession, out_dir: str, *,
                   n_buckets: int = 16,
                   block_size: int = codec.DEFAULT_BLOCK,
                   k1: float = scoring.K1, b: float = scoring.B,
                   expected_n_docs: int | None = None) -> dict:
    """Stage 2: global df/idf/avgdl over ALL chunks in the registry,
    rewrite segment blocks into final weighted+block-max postings,
    write corpus_stats.  Shared by the batch build and the streaming
    refresh (streaming/incremental.py) — after new chunks are
    appended, re-running this re-scales every weight to the new
    global statistics (idf/avgdl are global, so a refresh is a full
    postings rewrite — the Lucene-style segment-merge moment)."""
    paths = IndexPaths(out_dir)
    chunk_list = sorted(r["chunk"] for r in
                        spark.read.parquet(paths.chunks).collect())
    docs_all = spark.read.option("basePath", paths.docs).parquet(
        *[os.path.join(paths.docs, f"chunk={c}") for c in chunk_list])
    if expected_n_docs is None:
        n_docs = docs_all.count()
    else:
        n_docs = expected_n_docs
    # Every docs-side statistic (incl. the Heaps prefix token count)
    # fuses into ONE aggregation job — a cascade of tiny driver-
    # synchronized jobs would be dominated by scheduling overhead.
    half = n_docs // 2
    stats_row = docs_all.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_raw").alias("n_raw_tokens"),
        F.sum("dl").alias("sum_dl"),
        F.sum(F.when(F.col("doc_id") <= half, F.col("n_raw"))
              .otherwise(F.lit(0))).alias("t_half"),
    ).collect()[0]
    assert stats_row["n_docs"] == n_docs, \
        "docs chunks disagree with registry/stage0"
    # exact-integer division pins avgdl bit-identically vs the oracle
    avgdl = stats_row["sum_dl"] / n_docs if n_docs else 0.0

    segments = spark.read.option("basePath", paths.segments).parquet(
        *[os.path.join(paths.segments, f"chunk={c}")
          for c in chunk_list])
    df_table = segments.groupBy("term").agg(
        F.sum("df_part").alias("df"),
        F.min(F.element_at("blocks", 1)["first_doc_id"])
         .alias("min_doc_id"),
    )
    df_table.persist()
    vocab_row = df_table.agg(
        F.count("*").alias("vocab"),
        F.count(F.when(F.col("min_doc_id") <= half, True))
         .alias("v_half")).collect()[0]
    vocab = vocab_row["vocab"]

    joined = segments.join(df_table.select("term", "df"), "term")
    final_rows = joined.mapInPandas(
        _finalize_kernel(n_docs, avgdl, block_size, k1, b),
        schema=POSTINGS_SCHEMA)
    # repartition by bucket before the partitioned write: without it
    # every shuffle task writes a sliver into every bucket dir
    # (tasks × buckets small files — observed 970 at 32 cores) and
    # the serial commit protocol dominates.  One task per bucket here;
    # at petabyte scale repartition by (bucket, salt) instead so each
    # bucket gets n_chunks parallel writers and n_chunks files.
    (final_rows
     .withColumn("bucket", term_bucket(F.col("term"), n_buckets))
     .repartition(n_buckets, "bucket")
     .write.partitionBy("bucket").mode("overwrite")
     .parquet(paths.postings))

    # Heaps two-point fit (reference stat.go:15-33): V = K · T^B using
    # the full corpus and the doc_id ≤ N/2 prefix.
    v_half = vocab_row["v_half"]
    t_half = int(stats_row["t_half"] or 0)
    t_total = int(stats_row["n_raw_tokens"] or 0)
    heaps_b, heaps_k = float("nan"), float("nan")
    if v_half and t_half and t_total and vocab and t_total != t_half:
        heaps_b = math.log(vocab / v_half) / math.log(t_total / t_half)
        heaps_k = vocab / (t_total ** heaps_b)
    df_table.unpersist()

    stats_df = spark.createDataFrame(
        [(n_docs, t_total, int(stats_row["sum_dl"] or 0), avgdl, vocab,
          heaps_b, heaps_k, len(chunk_list), n_buckets, block_size,
          k1, b)],
        schema=("n_docs long, n_raw_tokens long, sum_dl long, "
                "avgdl double, vocabulary long, heaps_b double, "
                "heaps_k double, n_chunks int, n_buckets int, "
                "block_size int, k1 double, b double"))
    stats_df.coalesce(1).write.mode("overwrite").parquet(
        paths.corpus_stats)
    # drop the tokenize intermediate — postings/docs/stats are final
    import shutil
    shutil.rmtree(paths.term_rows, ignore_errors=True)
    return {"n_docs": n_docs, "vocabulary": vocab, "avgdl": avgdl,
            "heaps_b": heaps_b, "heaps_k": heaps_k,
            "n_chunks": len(chunk_list)}


def term_bucket(col, n_buckets: int):
    """Bucket assignment for postings partition pruning — must be a
    Spark-side expression so query-time lookups compute the same."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    *,
    n_chunks: int = 4,
    n_buckets: int = 16,
    block_size: int = codec.DEFAULT_BLOCK,
    stopwords: frozenset[str] = STOPWORDS,
    k1: float = scoring.K1,
    b: float = scoring.B,
    resume: bool = False,
    chunk_batch: int | None = None,
    fail_after_chunk: int | None = None,
) -> BuildResult:
    """Run the full build.  With ``resume=True``, stages whose
    manifest is present (and input fingerprint unchanged) are
    skipped.  ``fail_after_chunk`` injects a crash for the resume
    test (SURVEY.md §5.6)."""
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    stage_secs: dict[str, float] = {}
    resumed: list[str] = []

    # ---- stage 0: deterministic ids + chunk snapshot -----------------
    fp_row = pages.agg(
        F.count("*").alias("c"),
        F.expr("bit_xor(xxhash64(url))").alias("h")).collect()[0]
    # layout version participates in the fingerprint: an index built
    # by an older on-disk layout is rebuilt, not resumed into
    fingerprint = {"n_rows": fp_row["c"],
                   "url_hash_xor": str(fp_row["h"]),
                   "layout": INDEX_LAYOUT_VERSION}
    n_in = int(fp_row["c"])
    if resume and stage_complete(out_dir, "stage0", fingerprint):
        resumed.append("stage0")
        n_docs = read_manifest(out_dir, "stage0")["n_docs"]
    else:
        ts = time.time()
        # Stage 0 materializes ONLY the url->(doc_id, chunk) map —
        # never a copy of the corpus (an earlier design rewrote all
        # pages partitioned by chunk; that write was the largest
        # poorly-scaling cost of the whole build).  Chunks are
        # CONTIGUOUS doc-id ranges (query kernels map ids to dense
        # shard positions as id - chunk_base, and a streaming
        # micro-batch appends itself as simply "the next range"),
        # computed with exact integer DIV so the driver-side
        # closed-form registry below matches per-row assignment at
        # any magnitude.
        ids_map = assign_doc_ids(
            pages.select("url"), n_rows=n_in
        ).withColumn(
            "chunk", F.expr(f"CAST(((doc_id - 1) * {n_chunks}) "
                            f"DIV {max(n_in, 1)} AS INT)"))
        (ids_map.repartition(max(1, n_in // 2_000_000 + 1))
         .write.mode("overwrite").parquet(paths.url_map))
        # chunk registry in closed form (no job): chunk(d) =
        # (d-1)*k DIV n  =>  min_id(c) = ceil(c*n/k) + 1
        k = n_chunks
        bounds = [(c * n_in + k - 1) // k + 1 for c in range(k)]
        bounds.append(n_in + 1)
        reg = [(c, bounds[c], bounds[c + 1] - bounds[c])
               for c in range(k) if bounds[c + 1] > bounds[c]]
        (spark.createDataFrame(reg,
                               "chunk int, min_id long, n_docs long")
         .coalesce(1).write.mode("overwrite").parquet(paths.chunks))
        # row count is already pinned by the input fingerprint — no
        # verification re-scan (assign_doc_ids is row-preserving)
        n_docs = n_in
        stage_secs["stage0"] = time.time() - ts
        write_manifest(out_dir, "stage0", {
            "fingerprint": fingerprint, "n_docs": n_docs,
            "n_chunks": n_chunks, "output": paths.url_map,
            "wall_secs": stage_secs["stage0"],
            "lineage": {"stage": "stage0", "input": "web_pages",
                        "op": "assign_doc_ids+chunk-registry"},
        })

    # ---- stage 1: tokenize → segment blocks, per-chunk resumable ----
    # Downstream manifests embed the stage-0 input fingerprint, so a
    # re-staged (changed) input invalidates every chunk + finalize.
    #
    # All missing chunks run in ONE Spark pipeline (chunk is a group
    # key flowing through both kernels) — a sequential per-chunk loop
    # re-pays scan/shuffle/commit fixed costs n_chunks times and
    # starves wide clusters.  ``chunk_batch`` trades checkpoint
    # granularity against that orchestration cost: 1 = finest resume
    # (one job per chunk), None = all missing chunks in one job.
    # Either way each completed chunk gets its own manifest with
    # lineage + docs/sec, and resume skips completed chunks.
    missing = []
    for c in range(n_chunks):
        name = f"chunk-{c:04d}"
        if resume and stage_complete(out_dir, name, fingerprint):
            resumed.append(name)
        else:
            missing.append(c)
    batch = 1 if fail_after_chunk is not None else (chunk_batch or
                                                    len(missing) or 1)
    # attach (doc_id, chunk) by joining the small url map back to the
    # input — the corpus itself is never copied.  The map broadcasts
    # at sandbox scale; at 10^12 docs both sides would be bucketed by
    # url so this is a shuffle-free bucket join instead.
    ids_map = spark.read.parquet(paths.url_map)
    staged_all = pages.join(F.broadcast(ids_map), "url")
    par = spark.sparkContext.defaultParallelism
    for gi in range(0, len(missing), batch):
        group = missing[gi:gi + batch]
        ts = time.time()
        staged_g = staged_all.where(F.col("chunk").isin(group))
        # chunk parquet footprints are small relative to
        # maxPartitionBytes, so the scan would yield few tasks and the
        # tokenize kernel (the hottest op, SURVEY §6) would starve —
        # spread it across every core first
        # Two independent single-pass jobs, both re-running the cheap
        # tokenize (~0.2 ms/doc) rather than materializing or caching
        # its 140-rows-per-doc output between consumers (a .persist()
        # got evicted on large corpora and silently recomputed; an
        # explicit parquet intermediate paid a 33M-row write + two
        # reads — both slower than just tokenizing twice):
        #   job 1: docs dimension, ONE row/doc through Arrow
        #   job 2: term rows → (chunk, term) shuffle → packed blocks
        docs_g = (staged_g
                  .select("doc_id", "chunk", "url", "lang", "text")
                  .repartition(par, "doc_id")
                  .mapInPandas(_doc_stats_kernel(stopwords),
                               schema=DOC_STATS_SCHEMA))
        (docs_g.write.partitionBy("chunk")
         .option("partitionOverwriteMode", "dynamic")
         .mode("overwrite").parquet(paths.docs))
        segments_g = (
            staged_g.select("doc_id", "chunk", "text")
            .repartition(par, "doc_id")
            .mapInPandas(_tokenize_counts_kernel(stopwords),
                         schema=TERM_ROWS_SCHEMA)
            .withColumn("tbucket",
                        term_bucket(F.col("term"), n_buckets))
            .groupBy("chunk", "tbucket")
            .applyInPandas(_pack_segments_kernel(SEGMENT_BLOCK),
                           schema=SEGMENT_SCHEMA)
        )
        (segments_g.write.partitionBy("chunk")
         .option("partitionOverwriteMode", "dynamic")
         .mode("overwrite").parquet(paths.segments))
        wall = time.time() - ts
        for c in group:
            # count from the written files' parquet footers (metadata
            # only), also validating the chunk dir exists
            n_docs_c = spark.read.parquet(
                os.path.join(paths.docs, f"chunk={c}")).count()
            write_manifest(out_dir, f"chunk-{c:04d}", {
                "fingerprint": fingerprint,
                "chunk": c, "n_docs": n_docs_c,
                "wall_secs": wall / len(group),
                "docs_per_sec": (n_docs_c * len(group) / wall
                                 if wall > 0 else None),
                "outputs": [os.path.join(paths.segments, f"chunk={c}"),
                            os.path.join(paths.docs, f"chunk={c}")],
                "lineage": {"stage": "chunk", "chunk": c,
                            "input": "web_pages+url_map",
                            "op": "tokenize+count+segment-pack",
                            "block_size": block_size,
                            "batched_with": group},
            })
        if fail_after_chunk is not None and group[-1] >= fail_after_chunk:
            raise RuntimeError(
                f"injected failure after chunk-{group[-1]:04d}")

    # ---- stage 2: finalize ------------------------------------------
    if resume and stage_complete(out_dir, "finalize", fingerprint):
        resumed.append("finalize")
        m = read_manifest(out_dir, "finalize")
        wall_total = time.time() - t0
        return BuildResult(paths, m["n_docs"], wall_total,
                           m["docs_per_sec"], stage_secs, resumed)
    ts = time.time()
    fin = finalize_index(spark, out_dir, n_buckets=n_buckets,
                         block_size=block_size, k1=k1, b=b,
                         expected_n_docs=n_docs)
    vocab, avgdl = fin["vocabulary"], fin["avgdl"]
    stage_secs["finalize"] = time.time() - ts
    wall_total = time.time() - t0
    dps = n_docs / wall_total if wall_total > 0 else None
    write_manifest(out_dir, "finalize", {
        "fingerprint": fingerprint,
        "n_docs": n_docs, "vocabulary": vocab, "avgdl": avgdl,
        "wall_secs": stage_secs["finalize"], "docs_per_sec": dps,
        "outputs": [paths.postings, paths.corpus_stats],
        "lineage": {"stage": "finalize", "inputs": [paths.segments,
                                                    paths.docs],
                    "op": "df+idf+weights+final-pack",
                    "n_buckets": n_buckets},
    })
    return BuildResult(paths, n_docs, wall_total,
                       n_docs / wall_total, stage_secs, resumed)
