"""web_pages sources.

Input table shape is fixed by BASELINE.json ``input_hint``:

    web_pages(url string, warc_ts timestamp, html binary,
              text string, lang string)

Two providers:

1. :func:`synthetic_web_pages` — deterministic seeded generator
   (FIXTURES.md §1): Zipf draws over a mixed-case vocabulary with
   charset edge cases and a few df≈N hot terms to exercise skew
   salting.  Used by unit tests, the eval harness, and the scaling
   bench.  ``html`` wraps ``text`` so the per-row extraction
   invariant (extracted text byte-identical per url) is assertable.

2. :func:`documents_as_web_pages` — maps the driver's read-only
   ``documents`` parquet (doc_id, text, lang, source, n_chars) to the
   web_pages shape (FIXTURES.md §7) for the DuckDB-oracle contract.

Doc IDs are NEVER assigned by arrival order (the reference's CS276
ids are scheduling-dependent, trie.go:40-44 + cs276.go:20); the
canonical id is ``row_number() over (order by url)`` — deterministic
at any parallelism, which the two-cluster-size scaling check relies
on.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
    TimestampType,
)

WEB_PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), False),
    StructField("text", StringType(), False),
    StructField("lang", StringType(), False),
])

_EPOCH = _dt.datetime(2020, 1, 1, tzinfo=_dt.timezone.utc)

# Mixed-case vocabulary with charset edge cases (apostrophes, hyphens,
# slashes, digits, sub-3-char words, stopwords) — FIXTURES.md §1.
_BASE_VOCAB = [
    "search", "engine", "index", "query", "document", "ranking",
    "retrieval", "crawler", "parser", "token", "stemming", "boolean",
    "vector", "precision", "recall", "corpus", "postings", "weight",
    "frequency", "inverse", "merge", "intersect", "union", "filter",
    "Spark", "Catalyst", "shuffle", "partition", "broadcast", "salting",
    "don't", "o'clock", "state-of-the-art", "tcp/ip", "utf-8", "html5",
    "web2", "x86-64", "re-index", "co-occurrence", "I/O", "B-tree",
    "ab", "xy", "of", "the", "and", "to", "in", "it",  # short/stop
    "Zipf", "Heaps", "BM25", "WAND", "varint", "delta", "snappy",
    "running", "runner", "runs", "generously", "generation", "relational",
    "nations", "national", "happily", "happiness", "flies", "skies",
    "connection", "connected", "connecting", "connections",
]
_HOT_TERMS = ["webpage", "content", "information"]  # df ≈ N (skew)

# Appended to every doc of an ENRICHED host (synthetic_web_pages
# enrich_hosts > 0): carries all 8 Gopher required stopwords (so the
# quality gate's KEEP path is reachable on synthetic data — the Zipf
# vocabulary alone has none) plus a selective topic term with tf 3.
# Because urls sort by host, an enriched host's docs occupy a
# CONTIGUOUS doc-id run (~n/97 docs), so the topic term's block
# maxima are genuinely skewed across the id space — the shape
# block-max WAND needs to clear blocks on the main bench corpus.
_ENRICH_WORDS = ("the results must be sent to each of the replicas "
                 "and we verified that both copies have converged "
                 "with quorum blockmax pruning skips blockmax "
                 "thetacut blocks blockmax thetacut").split()


def _vocab_and_probs(vocab_size: int = 2000) -> tuple[list[str], np.ndarray]:
    vocab = list(_BASE_VOCAB)
    i = 0
    while len(vocab) < vocab_size:
        vocab.append(f"term{i:04d}")
        i += 1
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = 1.0 / ranks
    probs /= probs.sum()
    return vocab, probs


def generate_rows(n_docs: int, seed: int = 42) -> list[tuple]:
    """Driver-side deterministic generation (small scales only)."""
    vocab, probs = _vocab_and_probs()
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        length = int(rng.integers(20, 500))
        words = list(rng.choice(vocab, size=length, p=probs))
        # hot terms with df ≈ N
        for h in _HOT_TERMS:
            words.insert(int(rng.integers(0, len(words) + 1)), h)
        text = " ".join(words)
        url = f"https://host{i % 97}.example/p/{i:08d}"
        rows.append((
            url,
            _EPOCH + _dt.timedelta(seconds=i),
            b"<html><body>" + text.encode() + b"</body></html>",
            text,
            ["en", "de", "es", "fr", "zh"][i % 5],
        ))
    return rows


def link_targets(i: int, n_docs: int) -> list[int]:
    """Deterministic out-links of page *i* in an *n_docs* corpus:
    out-degree = i % 4, k-th target = (i*31 + k*17 + 7) mod n (self
    bumped to the next id).  Pure modular arithmetic so tests AND the
    DuckDB contract oracle (``lg_pagerank``) can re-derive the exact
    edge set; out-degree-0 pages (i ≡ 0 mod 4) exercise dangling-mass
    handling."""
    out = []
    for k in range(1, i % 4 + 1):
        j = (i * 31 + k * 17 + 7) % n_docs
        out.append((j + 1) % n_docs if j == i else j)
    return out


def synthetic_web_pages(spark: SparkSession, n_docs: int,
                        seed: int = 42, partitions: int | None = None,
                        tokens_lo: int = 20, tokens_hi: int = 500,
                        vocab_size: int = 2000,
                        with_links: bool = False,
                        enrich_hosts: int = 0) -> DataFrame:
    """Deterministic synthetic corpus as a DataFrame.

    Generation is distributed for large *n_docs*: each Spark task
    generates its own id range with a range-derived seed, so the
    result is independent of parallelism (required for the
    local[8]-vs-local[32] scaling-efficiency evidence).

    ``with_links=True`` prepends a ``<nav>`` block of anchor tags
    (targets per :func:`link_targets`, anchor text from the vocab) to
    the html — the TEXT column is untouched, so token goldens, doc
    ids and index bytes are identical with or without links, and the
    extraction invariant still holds (:func:`extracted_text` strips
    the nav).

    ``enrich_hosts=k`` appends ``_ENRICH_WORDS`` (Gopher required
    stopwords + a clustered selective topic term) to every doc whose
    host bucket is < k — i.e. k/97 of docs, each host a contiguous
    doc-id run.  Default 0 keeps all existing goldens byte-identical;
    the bench passes 10 so quality-gate keep paths and main-corpus
    WAND block skips are measurable (both were structurally zero on
    the pure-Zipf corpus).
    """
    parts = partitions or max(2, n_docs // 2000)
    rng_ids = spark.range(0, n_docs, numPartitions=parts)

    def gen(batches):
        import pandas as pd
        vocab, probs = _vocab_and_probs(vocab_size)
        vocab_arr = np.array(vocab, dtype=object)
        for pdf in batches:
            out = {"url": [], "warc_ts": [], "html": [], "text": [],
                   "lang": []}
            for i in pdf["id"].tolist():
                rng = np.random.default_rng(seed * 1_000_003 + i)
                length = int(rng.integers(tokens_lo, tokens_hi))
                words = list(vocab_arr[rng.choice(
                    len(vocab_arr), size=length, p=probs)])
                for h in _HOT_TERMS:
                    words.insert(int(rng.integers(0, len(words) + 1)), h)
                if (i % 97) < enrich_hosts:
                    words += _ENRICH_WORDS
                text = " ".join(words)
                nav = b""
                if with_links:
                    anchors = "".join(
                        f'<a href="https://host{j % 97}.example'
                        f'/p/{j:08d}">{vocab_arr[(i + j) % len(vocab_arr)]}'
                        "</a>"
                        for j in link_targets(i, n_docs))
                    nav = b"<nav>" + anchors.encode() + b"</nav>"
                out["url"].append(f"https://host{i % 97}.example/p/{i:08d}")
                out["warc_ts"].append(_EPOCH + _dt.timedelta(seconds=int(i)))
                out["html"].append(
                    b"<html>" + nav + b"<body>" + text.encode()
                    + b"</body></html>")
                out["text"].append(text)
                out["lang"].append(["en", "de", "es", "fr", "zh"][i % 5])
            yield pd.DataFrame(out)

    return rng_ids.mapInPandas(gen, schema=WEB_PAGES_SCHEMA)


def documents_as_web_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver's documents table to the web_pages shape
    (FIXTURES.md §7: url = source || '/' || doc_id)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat_ws("/", "source", F.col("doc_id").cast("string"))
         .alias("url"),
        F.lit(_EPOCH).alias("warc_ts"),
        F.col("text").cast("binary").alias("html"),
        "text",
        "lang",
    )


def extracted_text(pages: DataFrame) -> DataFrame:
    """Re-extract text from the raw ``html`` bytes, JVM-side.

    The input_hint fixes the per-row invariant: the ``text`` column
    IS the extraction output and must be byte-identical per url.
    For the synthetic corpus the markup is a minimal wrapper, so the
    extractor is two regexp_replaces inside whole-stage codegen; a
    real-HTML extractor would swap in an Arrow UDF (trafilatura /
    selectolax — not in this container) behind the same column
    contract.  Adds ``extracted_text``."""
    ex = F.regexp_replace(
        F.regexp_replace(F.col("html").cast("string"),
                         "^<html>(<nav>.*</nav>)?<body>", ""),
        "</body></html>$", "")
    return pages.withColumn("extracted_text", ex)


def extraction_mismatches(pages: DataFrame) -> DataFrame:
    """Urls violating the byte-identical extraction invariant
    (SURVEY.md §7 per-row invariant) — must be empty."""
    return (extracted_text(pages)
            .where((F.col("extracted_text") != F.col("text"))
                   | F.col("text").isNull())
            .select("url"))


def assign_doc_ids(pages: DataFrame, n_rows: int | None = None,
                   target_rows_per_bucket: int = 5000) -> DataFrame:
    """Canonical deterministic docID: dense 1..N by url order.

    Scale note: a bare ``row_number() over (order by url)`` collapses
    10^12 rows onto one partition.  The usual fix — range-partition,
    rank locally, add offsets — is execution-NONDETERMINISTIC in
    Spark: ``repartitionByRange`` samples boundaries per computation,
    so the offsets collected in one pass can disagree with the
    partitioning of the next (observed: duplicate ids).  Instead we
    make the partitioner a *pure function of the data*:

    1. deterministic hash-sample of urls -> sorted boundary list
       (driver-side, ~50 samples per bucket);
    2. bucket(url) = searchsorted(boundaries, url)  — an Arrow UDF,
       identical on every computation and at every parallelism;
    3. rank within bucket (partition-local sort) + per-bucket offsets
       from one tiny count aggregation.

    Result is exactly ``row_number() over (order by url)``, fully
    parallel, stable across recomputation — which the two-cluster-
    size scaling check and resume-from-checkpoint both rely on.
    Bucket count scales with n (cap 4096; at 10^12 docs raise the cap
    or the per-bucket target so each bucket's local sort fits spill).
    """
    from pyspark.sql.types import IntegerType
    from pyspark.sql.functions import pandas_udf

    spark = pages.sparkSession
    n = n_rows if n_rows is not None else pages.count()
    parts = max(1, min(4096, n // target_rows_per_bucket))
    boundaries: list[str] = []
    if parts > 1:
        sample_mod = max(1, n // (parts * 50))
        sample = sorted(
            r["url"] for r in pages.select("url")
            .where(F.pmod(F.xxhash64("url"), F.lit(sample_mod)) == 0)
            .collect())
        if sample:
            stride = max(1, len(sample) // parts)
            boundaries = sorted({sample[i] for i in
                                 range(stride, len(sample), stride)})

    bounds_arr = np.array(boundaries, dtype=object)

    @pandas_udf(IntegerType())
    def _bucket(urls: pd.Series) -> pd.Series:
        if len(bounds_arr) == 0:
            return pd.Series(np.zeros(len(urls), dtype=np.int32))
        return pd.Series(np.searchsorted(
            bounds_arr, urls.to_numpy(dtype=object), side="right"
        ).astype(np.int32))

    sdf = pages.withColumn("_b", _bucket(F.col("url")))
    counts = {r["_b"]: r["c"] for r in
              sdf.groupBy("_b").agg(F.count("*").alias("c")).collect()}
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    offmap = F.create_map(*[
        F.lit(x) for kv in offsets.items() for x in kv
    ]) if offsets else F.create_map()
    return sdf.withColumn(
        "_local", F.row_number().over(
            Window.partitionBy("_b").orderBy("url"))
    ).withColumn(
        "doc_id", (offmap[F.col("_b")] + F.col("_local")).cast("long")
    ).drop("_b", "_local")
