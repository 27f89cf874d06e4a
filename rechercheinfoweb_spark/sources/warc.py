"""WARC source/sink: Common-Crawl's container format for web pages.

The input_hint fixes the TABLE shape (url, warc_ts, html, text,
lang) but the wire format those tables are loaded from at Common
Crawl is WARC/1.0 (ISO 28500): a stream of length-prefixed records —
``warcinfo`` file headers, ``request``/``response`` capture pairs —
where each ``response`` record's payload is the HTTP envelope plus
the raw html bytes.  This module closes that first pipeline mile:

* :func:`write_warc` — distributed sink: one ``part-*.warc`` file
  per partition (the same file-per-task shape as a parquet sink),
  response records with deterministic record IDs, ``WARC-Date`` from
  ``warc_ts``, and the language carried in Common Crawl's own
  ``WARC-Identified-Content-Language`` extension header.
* :func:`warc_pages` — source: ``spark.read.format("binaryFile")``
  over a path glob, then an Arrow-batched kernel walks each file's
  records (Content-Length framing, never regex-splitting the body),
  keeps ``response`` records, strips the HTTP envelope, and
  re-extracts ``text`` with the same rules as
  ``sources.web_pages.extracted_text`` (the per-row extraction
  invariant: text is a pure function of html).

Scale shape: WARC files are NOT splittable (Common Crawl ships ~1 GB
gzip members), so parallelism = number of files — exactly how
production Spark/CC pipelines schedule them (one task per WARC,
~64k files per crawl).  The parse kernel streams records within a
task; downstream ops re-shard by whatever key they need, so the
unsplittable scan never constrains the rest of the plan.  The parsed
relation is byte-identical regardless of how rows were sharded into
files (pinned by tests), which is what lets the sink run
per-partition without coordination.

No reference analog (rechercheInfoWeb reads its corpora from local
custom formats, cacm.go:148-192 / cs276.go:42-108); this is the
Common-Crawl-facing source the brief's input_hint implies.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import os
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark.sql.types import StructField, StructType

from .web_pages import WEB_PAGES_SCHEMA

# Same shape as WEB_PAGES_SCHEMA but warc_ts is NULLABLE: a real
# archive can carry a missing/unparseable WARC-Date, which the
# tolerant parse surfaces as null rather than a dead scan task.
_WARC_PAGES_SCHEMA = StructType([
    StructField(f.name, f.dataType, f.name == "warc_ts")
    for f in WEB_PAGES_SCHEMA.fields])

_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"

# Byte-side twins of web_pages.extracted_text's two JVM regexes —
# the SAME extraction rule must hold whether text is recomputed in a
# Catalyst projection or during WARC ingest (invariant pinned in
# tests/test_warc.py against the column version).
_PRE_RE = re.compile(rb"^<html>(<nav>.*</nav>)?<body>")
_SUF_RE = re.compile(rb"</body></html>$")


def extract_text_bytes(html: bytes) -> bytes:
    """html bytes -> extracted text bytes (identity when the markup
    wrapper is absent — e.g. the driver's documents table, whose
    html IS the text bytes)."""
    return _SUF_RE.sub(b"", _PRE_RE.sub(b"", html))


def _uuid_of(url: str) -> str:
    h = hashlib.md5(url.encode()).hexdigest()
    return (f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-"
            f"{h[20:32]}>")


def _record(rtype: str, headers: list[str], payload: bytes) -> bytes:
    head = "\r\n".join(
        ["WARC/1.0", f"WARC-Type: {rtype}", *headers,
         f"Content-Length: {len(payload)}"])
    return head.encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"


def format_response_record(url: str, ts: _dt.datetime, html: bytes,
                           lang: str, *,
                           naive_tz: _dt.tzinfo = _dt.timezone.utc
                           ) -> bytes:
    """One WARC/1.0 response record: WARC headers + HTTP envelope +
    html payload, Content-Length framed at both layers.

    ``naive_tz`` is the zone attached to tz-NAIVE timestamps
    before converting to UTC (``write_warc`` itself ships UTC-aware
    instants, so it never needs it).  WARC/1.0 dates are
    second-granular — sub-second
    precision is truncated by design (WARC/1.1 allows fractions;
    ``warc_pages`` parses both)."""
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=naive_tz)
    ts = ts.astimezone(_dt.timezone.utc)
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
            b"charset=UTF-8\r\nContent-Length: "
            + str(len(html)).encode() + b"\r\n\r\n" + html)
    headers = [
        f"WARC-Target-URI: {url}",
        f"WARC-Date: {ts.strftime(_DATE_FMT)}",
        f"WARC-Record-ID: {_uuid_of(url)}",
        "Content-Type: application/http; msgtype=response",
    ]
    if lang:
        headers.append(f"WARC-Identified-Content-Language: {lang}")
    return _record("response", headers, http)


def _warcinfo(filename: str) -> bytes:
    body = b"software: rechercheinfoweb-spark\r\nformat: WARC/1.0\r\n"
    return _record("warcinfo", [
        f"WARC-Filename: {filename}",
        "Content-Type: application/warc-fields",
    ], body)


def write_warc(pages: DataFrame, out_dir: str,
               compress: bool = False,
               mode: str = "error") -> list[str]:
    """Distributed WARC sink: each partition writes ONE
    ``part-{pid:05d}.warc[.gz]`` (warcinfo header + a response
    record per row) — the parquet-sink shape: per-task files, no
    coordination, file count = partition count (``repartition``
    upstream to pick WARC sizes; CC targets ~1 GB).
    ``compress=True`` gzips the stream (Common Crawl's wire format).
    ``mode`` mirrors a parquet sink: ``"error"`` (default) refuses an
    out_dir that already holds part files — a re-run with fewer
    partitions must not silently merge stale parts into the dataset —
    and ``"overwrite"`` removes existing ``part-*.warc[.gz]`` first.
    Local/shared-FS path semantics (sandbox local mode = node-local
    dir); on a real cluster point ``out_dir`` at the mounted DFS.
    Returns the written paths."""
    os.makedirs(out_dir, exist_ok=True)
    stale = [f for f in os.listdir(out_dir)
             if f.startswith("part-")
             and (f.endswith(".warc") or f.endswith(".warc.gz"))]
    if stale:
        if mode == "overwrite":
            for f in stale:
                os.remove(os.path.join(out_dir, f))
        else:
            raise FileExistsError(
                f"{out_dir} already holds {len(stale)} WARC part "
                "file(s); pass mode='overwrite' to replace them "
                "(stale parts from a wider previous run would "
                "otherwise merge into this dataset)")
    # Ship warc_ts as UTC epoch seconds, cast JVM-side: a timestamp
    # is an instant, so the cast is session-tz independent, and no
    # tz string ever reaches the Arrow->pandas conversion (offset
    # zones like GMT+08:00 — valid Spark configs — are unparseable
    # by pyarrow/ZoneInfo and would fail every task; WARC-Date is
    # second-granular anyway).

    def _write(batches):
        import gzip

        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}.warc" + (".gz" if compress else "")
        path = os.path.join(out_dir, name)
        n = 0
        # mtime=0: byte-deterministic archives (no timestamp in the
        # gzip header), so re-runs produce identical files
        opener = (lambda p: gzip.GzipFile(p, "wb", mtime=0)) \
            if compress else (lambda p: open(p, "wb"))
        with opener(path) as f:
            f.write(_warcinfo(name))
            for pdf in batches:
                for url, epoch, html, lang in zip(
                        pdf["url"], pdf["_epoch"], pdf["html"],
                        pdf["lang"]):
                    ts = _dt.datetime.fromtimestamp(
                        int(epoch), _dt.timezone.utc)
                    f.write(format_response_record(
                        url, ts, bytes(html), lang))
                    n += 1
        yield pd.DataFrame({"file": [path], "n_records": [n]})

    written = (pages.select(
                   "url",
                   F.col("warc_ts").cast("long").alias("_epoch"),
                   "html", "lang")
               .mapInPandas(_write, "file string, n_records long")
               .collect())
    return sorted(r["file"] for r in written)


def parse_warc_stream(f):
    """Iterate (url, warc_date, html_bytes, lang) over one WARC
    stream's response records, reading INCREMENTALLY from a
    file-like object — peak memory is one record's payload, never
    the whole decompressed archive.  Content-Length framing: the
    payload is read by length, never searched, so html containing
    ``WARC/1.0`` or CRLF pairs round-trips exactly.  Non-response
    records (warcinfo, request, metadata) are skipped."""
    while True:
        line = f.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            continue  # inter-record CRLF padding or garbage
        hdrs = {}
        while True:
            ln = f.readline()
            if not ln or ln in (b"\r\n", b"\n"):
                break
            if b":" in ln:
                k, v = ln.split(b":", 1)
                hdrs[k.strip().lower().decode("utf-8", "replace")] = \
                    v.strip().decode("utf-8", "replace")
        try:
            clen = int(hdrs.get("content-length", "0"))
        except ValueError:
            clen = 0
        payload = f.read(clen)
        if hdrs.get("warc-type", "").lower() != "response":
            continue
        if payload[:5] == b"HTTP/":
            j = payload.find(b"\r\n\r\n")
            html = payload[j + 4:] if j >= 0 else b""
        else:  # resource-style record: payload IS the content
            html = payload
        yield (hdrs.get("warc-target-uri", ""),
               hdrs.get("warc-date", ""), html,
               hdrs.get("warc-identified-content-language", ""))


def parse_warc_bytes(data: bytes):
    """In-memory twin of :func:`parse_warc_stream`."""
    import io
    yield from parse_warc_stream(io.BytesIO(data))


def parse_warc_date(s: str) -> _dt.datetime | None:
    """Tolerant WARC-Date parse -> aware-UTC datetime, or None.

    Accepts WARC/1.0 second-granular dates AND WARC/1.1 fractional
    seconds (common in real Common Crawl archives), with 'Z' or a
    numeric offset.  A missing or unparseable date yields None (a
    null warc_ts column value) instead of killing the scan task."""
    if not s:
        return None
    try:
        dt = _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    return dt.astimezone(_dt.timezone.utc)


def warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC files -> web_pages DataFrame (input_hint schema).

    One task per file (binaryFile is unsplittable); text is
    re-extracted from the html payload byte-for-byte per the
    extraction invariant.  Each file parses as a STREAM (gzip
    decompressed incrementally) and yields its own Arrow batch, so a
    task's peak memory is one file's parsed rows — not the whole
    batch of files plus their decompressed bytes."""
    files = (spark.read.format("binaryFile")
             .load(path).select("content"))

    def _parse(batches):
        import gzip
        import io
        for pdf in batches:
            for content in pdf["content"]:
                data = bytes(content)  # materialize once per file
                raw = io.BytesIO(data)
                stream = (gzip.GzipFile(fileobj=raw)
                          if data[:2] == b"\x1f\x8b" else raw)
                urls, tss, htmls, texts, langs = [], [], [], [], []
                for url, ts, html, lang in parse_warc_stream(stream):
                    urls.append(url)
                    tss.append(parse_warc_date(ts))
                    htmls.append(html)
                    texts.append(extract_text_bytes(html)
                                 .decode("utf-8", "replace"))
                    langs.append(lang)
                yield pd.DataFrame({
                    "url": pd.Series(urls, dtype=object),
                    "warc_ts": pd.Series(tss,
                                         dtype="datetime64[ns, UTC]"),
                    "html": pd.Series(htmls, dtype=object),
                    "text": pd.Series(texts, dtype=object),
                    "lang": pd.Series(langs, dtype=object),
                })

    return files.mapInPandas(_parse, schema=_WARC_PAGES_SCHEMA)
