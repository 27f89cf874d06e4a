"""WARC source/sink: round-trip fidelity, partition invariance,
record-type filtering, and the extraction invariant."""

from __future__ import annotations

import datetime as dt

from rechercheinfoweb_spark.sources import warc
from rechercheinfoweb_spark.sources.web_pages import (
    extracted_text, synthetic_web_pages,
)


def _rows(df):
    return sorted(
        (r["url"], r["warc_ts"], bytes(r["html"]), r["text"], r["lang"])
        for r in df.collect())


def test_warc_roundtrip(spark, tmp_path):
    """write_warc -> warc_pages is the identity on every input_hint
    column (url, warc_ts, html bytes, extracted text, lang)."""
    pages = synthetic_web_pages(spark, 40, with_links=True)
    out = str(tmp_path / "warc")
    files = warc.write_warc(pages, out)
    assert files and all(f.endswith(".warc") for f in files)
    back = warc.warc_pages(spark, out)
    assert back.schema == pages.schema
    assert _rows(back) == _rows(pages)


def test_warc_parse_is_sharding_invariant(spark, tmp_path):
    """The parsed relation is independent of how rows were sharded
    into files (2 files vs 7 files)."""
    pages = synthetic_web_pages(spark, 30)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    warc.write_warc(pages.repartition(2), a)
    warc.write_warc(pages.repartition(7), b)
    assert _rows(warc.warc_pages(spark, a)) \
        == _rows(warc.warc_pages(spark, b))


def test_warc_text_matches_extraction_invariant(spark, tmp_path):
    """Ingest-time text == the column-expression extractor over the
    same html (the per-row invariant, both code paths)."""
    pages = synthetic_web_pages(spark, 20, with_links=True)
    out = str(tmp_path / "warc")
    warc.write_warc(pages, out)
    back = extracted_text(warc.warc_pages(spark, out))
    assert back.where("text <> extracted_text").count() == 0


def test_warc_gzip_roundtrip(spark, tmp_path):
    """compress=True writes .warc.gz (Common Crawl's wire format);
    the source detects the gzip magic and parses identically."""
    pages = synthetic_web_pages(spark, 25)
    plain, gz = str(tmp_path / "p"), str(tmp_path / "g")
    warc.write_warc(pages, plain)
    files = warc.write_warc(pages, gz, compress=True)
    assert all(f.endswith(".warc.gz") for f in files)
    assert _rows(warc.warc_pages(spark, gz)) \
        == _rows(warc.warc_pages(spark, plain))


def test_warc_skips_non_response_records(tmp_path):
    """warcinfo / request / metadata records are skipped; payloads
    containing CRLF pairs and 'WARC/' round-trip exactly
    (Content-Length framing, not delimiter splitting)."""
    ts = dt.datetime(2021, 6, 1, 12, 0, 0, tzinfo=dt.timezone.utc)
    tricky = b"body with\r\n\r\nblank lines and WARC/1.0 inside"
    data = (
        warc._warcinfo("t.warc")
        + warc._record("request", ["WARC-Target-URI: http://x/"],
                       b"GET / HTTP/1.1\r\n\r\n")
        + warc.format_response_record("http://x/", ts, tricky, "en")
        + warc._record("metadata", [], b"notes: none\r\n")
    )
    got = list(warc.parse_warc_bytes(data))
    assert got == [("http://x/", "2021-06-01T12:00:00Z", tricky, "en")]


def test_warc_resource_style_payload():
    """A response record whose payload has no HTTP envelope is taken
    as raw content (resource-style), and a missing language header
    parses as ''."""
    rec = warc._record("response", [
        "WARC-Target-URI: http://y/",
        "WARC-Date: 2020-01-01T00:00:00Z",
    ], b"<html><body>plain</body></html>")
    got = list(warc.parse_warc_bytes(rec))
    assert got == [("http://y/", "2020-01-01T00:00:00Z",
                    b"<html><body>plain</body></html>", "")]
