"""WARC source (tableio/warc.py): hand-written record fixtures — the
parser must handle multi-record archives, header case-insensitivity,
non-HTTP record types, UTF-8 bodies with octet Content-Lengths, and
route truncated/malformed tails to err rows instead of failing."""

import pytest

from image_pdf_ocr_suite_spark.tableio import warc


def _record(uri: str, body: bytes, wtype: str = "response",
            rid: str = "urn:test:1", http: bool = True) -> bytes:
    if http:
        block = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                 b"Content-Length: " + str(len(body)).encode()
                 + b"\r\n\r\n" + body)
    else:
        block = body
    ctype = (b"application/http; msgtype=response" if http
             else b"text/plain")
    return (b"WARC/1.0\r\nWARC-Type: " + wtype.encode()
            + b"\r\nWARC-Record-ID: <" + rid.encode() + b">\r\n"
            + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            + b"WARC-Target-URI: " + uri.encode() + b"\r\n"
            + b"Content-Type: " + ctype + b"\r\n"
            + b"Content-Length: " + str(len(block)).encode()
            + b"\r\n\r\n" + block + b"\r\n\r\n")


def _parse(spark, blob: bytes):
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "blob_id long, warc binary")
    return warc.parse_warc(df, "warc", keep_cols=("blob_id",)).collect()


def test_multi_record_archive(spark):
    blob = (_record("http://a/", b"alpha")
            + _record("http://b/", b"beta", rid="urn:test:2"))
    rows = _parse(spark, blob)
    assert [r["target_uri"] for r in rows] == ["http://a/", "http://b/"]
    assert [bytes(r["body"]) for r in rows] == [b"alpha", b"beta"]
    assert all(r["http_status"] == 200 and r["err"] is None for r in rows)
    assert rows[0]["record_id"] == "urn:test:1"
    assert all(r["blob_id"] == 1 for r in rows)


def test_utf8_body_octet_lengths(spark):
    body = "これはテスト。".encode("utf-8")
    rows = _parse(spark, _record("http://jp/", body))
    assert bytes(rows[0]["body"]) == body
    assert rows[0]["err"] is None


def test_non_http_record_passes_block_through(spark):
    rows = _parse(spark, _record("http://m/", b"meta-info", wtype="warcinfo",
                                 http=False))
    r = rows[0]
    assert r["warc_type"] == "warcinfo"
    assert r["http_status"] is None
    assert bytes(r["body"]) == b"meta-info"


def test_header_case_insensitive(spark):
    blob = _record("http://c/", b"x")
    blob = blob.replace(b"Content-Length:", b"CONTENT-LENGTH:", 1)
    rows = _parse(spark, blob)
    assert rows[0]["err"] is None and bytes(rows[0]["body"]) == b"x"


def test_truncated_record_yields_err_row(spark):
    blob = _record("http://a/", b"alpha") + _record("http://b/", b"beta")
    rows = _parse(spark, blob[:-20])          # cut into the second record
    assert rows[0]["err"] is None
    assert rows[-1]["err"] is not None and rows[-1]["target_uri"] is None


def test_garbage_blob_yields_err_row_not_failure(spark):
    rows = _parse(spark, b"\x00\x01 not a warc at all")
    assert len(rows) == 1 and rows[0]["err"] is not None


def test_writer_expression_roundtrips(spark):
    from pyspark.sql import functions as F
    d = spark.createDataFrame(
        [(7, "https://x/doc/7", "2024-01-01T00:00:00Z", "héllo wörld")],
        "doc_id long, uri string, wdate string, body string")
    blob = d.select(F.encode(
        warc.warc_record_expr("uri", "wdate", "body"), "UTF-8")
        .alias("warc"))
    rows = warc.parse_warc(blob, "warc").collect()
    r = rows[0]
    assert r["target_uri"] == "https://x/doc/7"
    assert bytes(r["body"]).decode("utf-8") == "héllo wörld"
    assert r["warc_date"] == "2024-01-01T00:00:00Z"
    assert r["err"] is None
