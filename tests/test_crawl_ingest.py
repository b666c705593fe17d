"""Crawl-ingestion composition (jobs/crawl_ingest_job.py): WARC
archives -> the north-rule pages table (url, warc_ts, html, text,
lang), with reject accounting and re-crawl resolution."""

import datetime

import pytest
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.tableio.warc import warc_record_expr
from jobs.crawl_ingest_job import ingest_pages


def _raw_record(uri, date, body, warc_type="response",
                status=b"200 OK", ctype=b"text/html"):
    http = (b"HTTP/1.1 " + status + b"\r\nContent-Type: " + ctype
            + b"\r\nContent-Length: " + str(len(body)).encode()
            + b"\r\n\r\n" + body)
    head = (b"WARC/1.0\r\nWARC-Type: " + warc_type.encode()
            + b"\r\nWARC-Record-ID: <urn:t:" + uri.encode() + b">"
            + b"\r\nWARC-Date: " + date.encode()
            + (b"\r\nWARC-Target-URI: " + uri.encode() if uri else b"")
            + b"\r\nContent-Type: application/http; msgtype=response"
            + b"\r\nContent-Length: " + str(len(http)).encode())
    return head + b"\r\n\r\n" + http + b"\r\n\r\n"


HTML_EN = (b"<html><body><p>" + b"plain english words " * 12
           + b"</p></body></html>")
HTML_JA = ("<meta charset=Shift_JIS><p>"
           + "日本語の文書です。" * 10
           + "</p>").encode("shift_jis")


@pytest.fixture(scope="module")
def result(spark):
    good_en_old = _raw_record("https://a/x", "2026-01-01T00:00:00Z", HTML_EN)
    good_en_new = _raw_record("https://a/x", "2026-03-01T00:00:00Z", HTML_EN)
    good_ja = _raw_record("https://b/y", "2026-01-02T00:00:00Z", HTML_JA)
    not_found = _raw_record("https://c/z", "2026-01-03T00:00:00Z",
                            b"gone", status=b"404 Not Found")
    request_rec = _raw_record("https://a/x", "2026-01-01T00:00:00Z",
                              b"", warc_type="request")
    truncated = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99"
    archives = spark.createDataFrame(
        [(good_en_old + good_ja + request_rec,),
         (good_en_new + not_found,),
         (truncated,)], "warc binary")
    pages, rejects = ingest_pages(archives)
    return pages.collect(), rejects.collect()


def test_pages_shape_and_charset(result):
    pages, _ = result
    by_url = {r["url"]: r for r in pages}
    assert set(by_url) == {"https://a/x", "https://b/y"}
    en = by_url["https://a/x"]
    assert en["lang"] == "en" and b"plain english" in bytes(en["html"])
    assert "plain english words" in en["text"]
    assert "<p>" not in en["text"]            # boilerplate strip ran
    ja = by_url["https://b/y"]
    assert ja["lang"] == "ja"
    assert "日本語の文書" in ja["text"]  # SJIS decoded


def test_recrawl_keeps_latest(result):
    pages, rejects = result
    en = {r["url"]: r for r in pages}["https://a/x"]
    assert en["warc_ts"] == datetime.datetime(2026, 3, 1)
    assert ("https://a/x", "superseded recrawl") in {
        (r["url"], r["reason"]) for r in rejects}


def test_reject_accounting(result):
    _, rejects = result
    reasons = {(r["url"], r["reason"]) for r in rejects}
    assert ("https://c/z", "http status 404") in reasons
    assert any(u is None and why.startswith("warc: ")
               for u, why in reasons)
    # the request record is skipped silently: 3 rejects total
    assert len(rejects) == 3


def test_keep_all_recrawls(spark):
    a = _raw_record("https://a/x", "2026-01-01T00:00:00Z", HTML_EN)
    b = _raw_record("https://a/x", "2026-03-01T00:00:00Z", HTML_EN)
    archives = spark.createDataFrame([(a + b,)], "warc binary")
    pages, rejects = ingest_pages(archives, keep_latest=False)
    assert pages.count() == 2 and rejects.count() == 0


def test_catalyst_writer_round_trips_through_ingest(spark):
    docs = spark.range(3).select(
        F.concat(F.lit("https://w/"), F.col("id")).alias("uri"),
        F.lit("2026-02-02T02:02:02Z").alias("dt"),
        F.concat(F.lit("<p>body words here for doc "), F.col("id"),
                 F.lit(" plus some more english text</p>")).alias("body"))
    archives = docs.select(
        F.encode(warc_record_expr("uri", "dt", "body"), "UTF-8")
        .alias("warc"))
    pages, rejects = ingest_pages(archives)
    assert rejects.count() == 0
    rows = {r["url"]: r["text"] for r in pages.collect()}
    assert len(rows) == 3
    assert "body words here for doc 1" in rows["https://w/1"]


def _raw_revisit(uri, date, digest, refers_to):
    head = (b"WARC/1.0\r\nWARC-Type: revisit"
            + b"\r\nWARC-Record-ID: <urn:rv:" + uri.encode() + b">"
            + b"\r\nWARC-Date: " + date.encode()
            + b"\r\nWARC-Target-URI: " + uri.encode()
            + b"\r\nWARC-Refers-To: <" + refers_to.encode() + b">"
            + b"\r\nWARC-Payload-Digest: md5:" + digest.encode()
            + b"\r\nContent-Length: 0")
    return head + b"\r\n\r\n" + b"\r\n\r\n"


def test_ingest_resolves_revisit_records(spark):
    import hashlib
    resp = _raw_record("https://r/x", "2026-01-01T00:00:00Z", HTML_EN)
    rev = _raw_revisit("https://r/x", "2026-05-01T00:00:00Z",
                       hashlib.md5(HTML_EN).hexdigest(),
                       "urn:t:https://r/x")
    archives = spark.createDataFrame([(resp + rev,)], "warc binary")

    # without the flag: revisit skipped, the old response row survives
    pages, _ = ingest_pages(archives)
    rows = pages.collect()
    assert len(rows) == 1
    assert rows[0]["warc_ts"].month == 1

    # with the flag: the revisit wins the latest-crawl window and
    # carries the ORIGINAL body
    pages, rejects = ingest_pages(archives, resolve_revisits=True)
    rows = pages.collect()
    assert len(rows) == 1
    assert rows[0]["warc_ts"].month == 5
    assert bytes(rows[0]["html"]) == HTML_EN
    assert "plain english words" in rows[0]["text"]
    assert any(r["reason"] == "superseded recrawl"
               for r in rejects.collect())


def test_ingest_unresolved_revisit_rejected(spark):
    rev = _raw_revisit("https://r/y", "2026-05-01T00:00:00Z",
                       "0" * 32, "urn:t:missing")
    archives = spark.createDataFrame([(rev,)], "warc binary")
    pages, rejects = ingest_pages(archives, resolve_revisits=True)
    assert pages.count() == 0
    reasons = [r["reason"] for r in rejects.collect()]
    assert any("revisit: unresolved reference" in r for r in reasons)


# ---- narrow latest-crawl resolution (losers anti-join) ----------------

def _uid_record(uri, date, body):
    """A response record whose id is unique per (uri, date) — the
    WARC-conformant layout (ids globally unique across recrawls)."""
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html"
            + b"\r\nContent-Length: " + str(len(body)).encode()
            + b"\r\n\r\n" + body)
    head = (b"WARC/1.0\r\nWARC-Type: response"
            + b"\r\nWARC-Record-ID: <urn:t:" + uri.encode() + b"@"
            + date.encode() + b">"
            + b"\r\nWARC-Date: " + date.encode()
            + b"\r\nWARC-Target-URI: " + uri.encode()
            + b"\r\nContent-Type: application/http; msgtype=response"
            + b"\r\nContent-Length: " + str(len(http)).encode())
    return head + b"\r\n\r\n" + http + b"\r\n\r\n"


@pytest.fixture(scope="module")
def recrawl_archives(spark):
    recs = []
    for i in range(12):
        uri = f"https://eq/{i}"
        body = f"<p>doc {i} body with some words</p>".encode()
        recs.append(_uid_record(uri, "2026-03-01T00:00:00Z", body))
        if i % 3 == 0:                       # superseded earlier crawls
            recs.append(_uid_record(uri, "2026-01-01T00:00:00Z", body))
        if i % 4 == 0:
            recs.append(_uid_record(uri, "2026-02-01T00:00:00Z", body))
    blobs = [(b"".join(recs[j::3]),) for j in range(3)]   # 3 mixed blobs
    return spark.createDataFrame(blobs, "warc binary")


def test_latest_plan_equivalence(spark, recrawl_archives):
    """The narrow losers anti-join and the body-shuffling window plan
    produce identical pages AND identical rejects."""
    def snap(df, cols):
        return sorted(tuple(r) for r in df.select(*cols).collect())

    pg_n, rj_n = ingest_pages(recrawl_archives, latest_plan="narrow")
    pg_w, rj_w = ingest_pages(recrawl_archives, latest_plan="window")
    cols = ["url", "warc_ts", "text", "lang"]
    assert snap(pg_n, cols) == snap(pg_w, cols)
    assert snap(rj_n, ["url", "reason"]) == snap(rj_w, ["url", "reason"])
    assert len(snap(pg_n, ["url"])) == 12
    n_superseded = sum(1 for r in rj_n.collect()
                       if r["reason"] == "superseded recrawl")
    assert n_superseded == 4 + 3             # i%3==0 plus i%4==0 extras


def test_latest_plan_equivalence_shared_ids(spark):
    """Composite-key robustness: a record id reused across a url's
    crawls (spec-violating) still resolves identically to the window
    plan because warc_ts disambiguates."""
    old = _raw_record("https://s/x", "2026-01-01T00:00:00Z",
                      b"<p>old crawl body with plainly many words</p>")
    new = _raw_record("https://s/x", "2026-03-01T00:00:00Z",
                      b"<p>new crawl body with plainly many words</p>")
    archives = spark.createDataFrame([(old + new,)], "warc binary")
    pg_n, _ = ingest_pages(archives, latest_plan="narrow")
    pg_w, _ = ingest_pages(archives, latest_plan="window")
    rows_n = [(r["url"], r["text"]) for r in pg_n.collect()]
    rows_w = [(r["url"], r["text"]) for r in pg_w.collect()]
    assert rows_n == rows_w
    assert rows_n == [("https://s/x", "new crawl body with plainly "
                                      "many words")]


def test_narrow_plan_broadcasts_losers_and_never_shuffles_html(
        spark, recrawl_archives):
    """Scale shape of the default plan: the loser set rides a broadcast
    anti join (AQE sizes it at runtime), so page bodies cross NO
    exchange — the whole body path is scan -> kernel, map-only."""
    pages, _ = ingest_pages(recrawl_archives, latest_plan="narrow")
    pages.collect()                          # let AQE finalize the plan
    plan = pages._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    for ln in plan.splitlines():             # no body-carrying exchange
        if "Exchange" in ln and "broadcast" not in ln.lower():
            assert "body" not in ln and "html" not in ln, plan


def test_headers_walk_parity(spark, recrawl_archives):
    """parse_warc_headers agrees with the full parser's envelope
    projection record-for-record, including err taxonomy, on blobs
    with good/404/non-response/truncated/missing-CL records."""
    from image_pdf_ocr_suite_spark.tableio.warc import (parse_warc,
                                                        parse_warc_headers)

    mixed = spark.createDataFrame([
        (_raw_record("https://h/ok", "2026-01-02T00:00:00Z", b"<p>x</p>")
         + _raw_record("https://h/404", "2026-01-03T00:00:00Z", b"gone",
                       status=b"404 Not Found")
         + _raw_record("https://h/req", "2026-01-04T00:00:00Z", b"",
                       warc_type="request"),),
        (b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99"
         b"\r\n\r\nshort",),                 # truncated body
        (b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99",),
        (b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <u:1>"
         b"\r\n\r\n\r\n\r\n",),
    ], "warc binary")
    cols = ["record_id", "warc_type", "target_uri", "warc_date",
            "http_status", "err"]
    full = sorted((tuple(r) for r in parse_warc(mixed).select(*cols)
                   .collect()), key=repr)
    narrow = sorted((tuple(r) for r in parse_warc_headers(mixed)
                     .collect()), key=repr)
    assert full == narrow
    assert any(r[-1] and "truncated" in r[-1] for r in narrow)
    assert any(r[-1] and "Content-Length" in r[-1] for r in narrow)


# ---- binary image-PDF payloads in the crawl (the OCR composition) ------

def test_ingest_preserves_pdf_payloads_then_ocr(spark):
    """A crawl archive carrying an image-PDF response is NOT shredded
    through the HTML stripper: its text stays NULL / lang unknown with
    the payload intact, and extract_pages over the ingested pages table
    produces the refmodel's byte-identical OCR text — the end-to-end
    crawl→extraction composition."""
    from image_pdf_ocr_suite_spark import extract_pages
    from image_pdf_ocr_suite_spark.fixtures import make_payload
    from image_pdf_ocr_suite_spark.refmodel import extract_text

    payload = make_payload(3, "scanned page words for the ocr path")
    blob = (_raw_record("https://c/html", "2026-01-01T00:00:00Z", HTML_EN)
            + _raw_record("https://c/pdf", "2026-01-01T00:00:00Z",
                          payload, ctype=b"application/pdf"))
    pages, rejects = ingest_pages(
        spark.createDataFrame([(blob,)], "warc binary"))
    rows = {r["url"]: r for r in pages.collect()}
    assert rejects.count() == 0 and len(rows) == 2
    pdf_row = rows["https://c/pdf"]
    assert pdf_row["text"] is None and pdf_row["lang"] == "unknown"
    assert bytes(pdf_row["html"]) == payload
    assert rows["https://c/html"]["text"].startswith("plain english")

    res = extract_pages(pages)
    texts = {r["url"]: r["extracted_text"] for r in res.text.collect()}
    assert texts["https://c/pdf"] == extract_text(payload)
