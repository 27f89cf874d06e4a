"""WARC source/sink: round-trip fidelity, partition invariance,
record-type filtering, and the extraction invariant."""

from __future__ import annotations

import datetime as dt

import pytest

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
    # same names and types; warc_ts is nullable on the read side
    # (real archives can lack WARC-Date), the rest stays non-null
    assert [(f.name, f.dataType) for f in back.schema.fields] \
        == [(f.name, f.dataType) for f in pages.schema.fields]
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


def test_warc_date_tolerant_parse():
    """WARC/1.1 fractional seconds, numeric offsets, and missing or
    garbage dates all parse tolerantly (None, never ValueError)."""
    utc = dt.timezone.utc
    assert warc.parse_warc_date("2021-06-01T12:00:00Z") \
        == dt.datetime(2021, 6, 1, 12, 0, 0, tzinfo=utc)
    assert warc.parse_warc_date("2021-06-01T12:00:00.123456Z") \
        == dt.datetime(2021, 6, 1, 12, 0, 0, 123456, tzinfo=utc)
    assert warc.parse_warc_date("2021-06-01T14:00:00+02:00") \
        == dt.datetime(2021, 6, 1, 12, 0, 0, tzinfo=utc)
    assert warc.parse_warc_date("") is None
    assert warc.parse_warc_date("not-a-date") is None


def test_warc_pages_survives_bad_dates(spark, tmp_path):
    """A record with a fractional (WARC/1.1) date and one with NO
    WARC-Date must not kill the scan task: the fractional date
    parses, the missing one yields a null warc_ts."""
    rec_frac = warc._record("response", [
        "WARC-Target-URI: http://frac/",
        "WARC-Date: 2021-06-01T12:00:00.500000Z",
    ], b"<html><body>frac</body></html>")
    rec_none = warc._record("response", [
        "WARC-Target-URI: http://nodate/",
    ], b"<html><body>nodate</body></html>")
    p = tmp_path / "w"
    p.mkdir()
    (p / "part-00000.warc").write_bytes(rec_frac + rec_none)
    rows = {r["url"]: r["warc_ts"]
            for r in warc.warc_pages(spark, str(p)).collect()}
    assert rows["http://frac/"] == dt.datetime(2021, 6, 1, 12, 0, 0,
                                               500000)
    assert rows["http://nodate/"] is None


def test_warc_sink_overwrite_semantics(spark, tmp_path):
    """Re-writing into a non-empty dir fails by default (stale wider
    parts must not merge into the dataset); mode='overwrite' removes
    them first so a narrower re-run leaves exactly its own parts."""
    import os

    import pytest

    pages = synthetic_web_pages(spark, 30)
    out = str(tmp_path / "warc")
    warc.write_warc(pages.repartition(7), out)
    with pytest.raises(FileExistsError, match="overwrite"):
        warc.write_warc(pages.repartition(2), out)
    warc.write_warc(pages.repartition(2), out, mode="overwrite")
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 2
    assert warc.warc_pages(spark, out).count() == 30


def test_warc_naive_ts_uses_declared_zone():
    """A tz-naive timestamp is interpreted in the declared zone, not
    silently as UTC: 14:00 naive at +02:00 is 12:00Z on the wire."""
    from zoneinfo import ZoneInfo

    naive = dt.datetime(2021, 6, 1, 14, 0, 0)
    rec = warc.format_response_record(
        "http://z/", naive, b"x", "en",
        naive_tz=ZoneInfo("Europe/Paris"))
    assert b"WARC-Date: 2021-06-01T12:00:00Z" in rec


def test_warc_nonutc_session_roundtrip(spark, tmp_path):
    """write_warc is correct under a non-UTC session timezone: the
    sink localizes Arrow's session-naive values with the session
    zone, so the round-trip still returns the original instants."""
    pages = synthetic_web_pages(spark, 8)
    expect = _rows(pages)
    out = str(tmp_path / "warc_tz")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        warc.write_warc(pages, out)
        got = _rows(warc.warc_pages(spark, out))
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert got == expect


def test_warc_offset_session_tz_write(spark, tmp_path):
    """An offset-style session timezone (a valid Spark config that
    neither ZoneInfo nor pyarrow can resolve) must not fail the
    write tasks: the sink ships warc_ts as UTC epoch seconds cast
    JVM-side, so no tz string reaches the Arrow conversion.  Read
    back under UTC returns the original instants.  (Collecting a
    timestamp column under an offset session tz fails inside
    pyspark's own Arrow collect path — upstream, unrelated to the
    sink — so the read half runs under UTC.)"""
    out = str(tmp_path / "warc_off")
    spark.conf.set("spark.sql.session.timeZone", "GMT+08:00")
    try:
        pages = synthetic_web_pages(spark, 6)
        warc.write_warc(pages, out)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    expect = _rows(synthetic_web_pages(spark, 6))
    got = _rows(warc.warc_pages(spark, out))
    assert got == expect
