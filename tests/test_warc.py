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


def test_wet_wat_derivatives_roundtrip(spark):
    from pyspark.sql import functions as F
    d = spark.createDataFrame(
        [(7, "https://x/doc/7", "2024-01-01T00:00:00Z",
          "<p>héllo wörld</p>", "héllo wörld")],
        "doc_id long, uri string, wdate string, html string, txt string")
    d = d.withColumn(
        "resp_id", warc.response_record_id_expr("uri", "wdate", "html"))
    d = d.withColumn("meta_json", F.to_json(F.struct(
        F.col("uri").alias("url"), F.lit(2).alias("n_links"))))
    blob = d.select(F.encode(F.concat(
        warc.warc_record_expr("uri", "wdate", "html"),
        warc.wet_record_expr("uri", "wdate", "txt", "resp_id"),
        warc.wat_record_expr("uri", "wdate", "meta_json", "resp_id")),
        "UTF-8").alias("warc"))
    rows = {r["warc_type"]: r for r in warc.parse_warc(blob, "warc").collect()}
    assert set(rows) == {"response", "conversion", "metadata"}
    resp, wet, wat = rows["response"], rows["conversion"], rows["metadata"]
    assert resp["err"] is None and wet["err"] is None and wat["err"] is None
    # derivatives point back at the response record they derive from
    assert wet["refers_to"] == resp["record_id"]
    assert wat["refers_to"] == resp["record_id"]
    assert resp["refers_to"] is None
    # distinct deterministic ids (salted urns never collide)
    assert len({resp["record_id"], wet["record_id"], wat["record_id"]}) == 3
    # payloads survive octet-exact
    assert bytes(wet["body"]).decode("utf-8") == "héllo wörld"
    assert wet["warc_content_type"] == "text/plain"
    assert wat["warc_content_type"] == "application/json"
    import json
    meta = json.loads(bytes(wat["body"]).decode("utf-8"))
    assert meta == {"url": "https://x/doc/7", "n_links": 2}
    # same uri/date on all three records
    assert all(r["target_uri"] == "https://x/doc/7" for r in rows.values())


def test_revisit_record_resolves_body(spark):
    from pyspark.sql import functions as F
    d = spark.createDataFrame(
        [(1, "https://x/p", "2024-01-01T00:00:00Z",
          "2024-06-01T00:00:00Z", "<p>same bytes</p>")],
        "doc_id long, uri string, d1 string, d2 string, html string")
    d = d.withColumn("resp_id",
                     warc.response_record_id_expr("uri", "d1", "html"))
    d = d.withColumn("digest", F.md5("html"))
    blob = d.select(F.encode(F.concat(
        warc.warc_record_expr("uri", "d1", "html"),
        warc.revisit_record_expr("uri", "d2", "digest", "resp_id")),
        "UTF-8").alias("warc"))
    recs = warc.parse_warc(blob, "warc")
    rows = {r["warc_type"]: r for r in recs.collect()}
    rv = rows["revisit"]
    assert rv["err"] is None
    assert rv["body"] == bytearray(b"") or bytes(rv["body"]) == b""
    assert rv["payload_digest"].startswith("md5:")
    assert rv["refers_to"] == rows["response"]["record_id"]

    out = {(r["warc_type"], r["warc_date"]): r
           for r in warc.resolve_revisits(recs).collect()}
    resolved = out[("revisit", "2024-06-01T00:00:00Z")]
    assert resolved["was_revisit"] is True
    assert bytes(resolved["body"]).decode() == "<p>same bytes</p>"
    assert resolved["http_status"] == 200
    assert resolved["err"] is None
    original = out[("response", "2024-01-01T00:00:00Z")]
    assert original["was_revisit"] is False
    assert bytes(original["body"]).decode() == "<p>same bytes</p>"


def test_unresolved_revisit_is_err_row_not_empty_body(spark):
    from pyspark.sql import functions as F
    d = spark.createDataFrame(
        [(1, "https://x/p", "2024-06-01T00:00:00Z", "deadbeef" * 4,
          "urn:md5:missing")],
        "doc_id long, uri string, d2 string, digest string, ref string")
    blob = d.select(F.encode(
        warc.revisit_record_expr("uri", "d2", "digest", "ref"),
        "UTF-8").alias("warc"))
    out = warc.resolve_revisits(warc.parse_warc(blob, "warc")).collect()
    assert len(out) == 1
    assert out[0]["was_revisit"] is True
    assert out[0]["err"].startswith("revisit: unresolved reference")


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
