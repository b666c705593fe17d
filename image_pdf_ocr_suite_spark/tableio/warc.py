"""WARC/1.0 source format: a Catalyst record-writer expression and an
Arrow parsing kernel for Common-Crawl-style web archive blobs.

The north-rule input is an Iceberg table of Common-Crawl-style pages;
upstream of that table sits the crawl's native interchange format —
WARC (ISO 28500).  This module gives the engine both directions:

- ``warc_record_expr``: a pure-Catalyst string expression assembling a
  conformant ``WARC-Type: response`` record (version line, headers,
  ``Content-Length`` in OCTETS via ``octet_length``, wrapped HTTP/1.1
  response) — used to synthesize deterministic fixture archives and as
  a sink projection.
- ``parse_warc``: a ``mapInPandas`` Arrow kernel that walks a binary
  column of concatenated records (a WARC file is exactly that) and
  emits one row per record with the parsed envelope + HTTP payload.
  Map-only: no shuffle, batches stream through the Python worker, and
  a malformed tail lands in the ``err`` column of a best-effort row
  instead of failing the task (the quarantine contract,
  reference ocr.py:775-779's error-taxonomy analog).
- ``wet_record_expr`` / ``wat_record_expr``: the Common-Crawl
  DERIVATIVE formats — WET (``WARC-Type: conversion``, text/plain body
  holding the extracted text) and WAT (``WARC-Type: metadata``,
  application/json body holding per-page metadata).  Both are pure
  Catalyst and both parse back through the same ``parse_warc`` walker
  (heterogeneous archives mixing response/conversion/metadata records
  are the production layout).  ``WARC-Refers-To`` carries the id of
  the response record a derivative was computed from.

Reference scope note: the reference suite has no WARC layer — this is
part of the task-mandated Common-Crawl source surface (SURVEY §2.1 /
north_rule input), built Spark-first.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

_CRLF = "\r\n"


def warc_record_expr(uri_col, date_col, body_col, record_id_col=None):
    """String expression of one ``WARC-Type: response`` record wrapping
    ``body_col`` (string) in a minimal ``HTTP/1.1 200 OK`` response.

    Both ``Content-Length`` headers count OCTETS (``octet_length``), so
    the record parses correctly for any UTF-8 body.  ``date_col`` must
    already be formatted ``YYYY-MM-DDTHH:MM:SSZ`` (WARC-Date grammar);
    ``record_id_col`` defaults to a urn built from the md5 of
    (uri, date, body) — deterministic, so a rebuilt archive is
    byte-identical."""
    uri, date, body = F.col(uri_col), F.col(date_col), F.col(body_col)
    rid = (F.col(record_id_col) if record_id_col is not None else
           F.concat(F.lit("urn:md5:"),
                    F.md5(F.concat_ws("\x1f", uri, date, body))))
    http = F.concat(
        F.lit("HTTP/1.1 200 OK" + _CRLF
              + "Content-Type: text/html; charset=utf-8" + _CRLF
              + "Content-Length: "),
        F.octet_length(body).cast("string"), F.lit(_CRLF + _CRLF), body)
    return F.concat(
        F.lit("WARC/1.0" + _CRLF + "WARC-Type: response" + _CRLF
              + "WARC-Record-ID: <"),
        rid,
        F.lit(">" + _CRLF + "WARC-Date: "), date,
        F.lit(_CRLF + "WARC-Target-URI: "), uri,
        F.lit(_CRLF + "Content-Type: application/http; msgtype=response"
              + _CRLF + "Content-Length: "),
        F.octet_length(http).cast("string"),
        F.lit(_CRLF + _CRLF), http, F.lit(_CRLF + _CRLF))


def response_record_id_expr(uri_col, date_col, body_col):
    """The deterministic record id ``warc_record_expr`` assigns when no
    explicit ``record_id_col`` is given — exposed so WET/WAT writers can
    point ``WARC-Refers-To`` at the response record they derive from."""
    return F.concat(
        F.lit("urn:md5:"),
        F.md5(F.concat_ws("\x1f", F.col(uri_col), F.col(date_col),
                          F.col(body_col))))


def _derivative_record_expr(warc_type: str, content_type: str, salt: str,
                            uri_col, date_col, body_col,
                            refers_to_col=None):
    """Shared writer for the non-HTTP derivative record types.  The
    record id salts the md5 urn with the record type so a WET/WAT pair
    derived from the same (uri, date) never collides with each other or
    with the response record's id.  ``Content-Length`` counts octets of
    the (string) body."""
    uri, date, body = F.col(uri_col), F.col(date_col), F.col(body_col)
    rid = F.concat(F.lit("urn:md5:"),
                   F.md5(F.concat_ws("\x1f", F.lit(salt), uri, date, body)))
    refers = (F.concat(F.lit("WARC-Refers-To: <"), F.col(refers_to_col),
                       F.lit(">" + _CRLF))
              if refers_to_col is not None else F.lit(""))
    return F.concat(
        F.lit("WARC/1.0" + _CRLF + "WARC-Type: " + warc_type + _CRLF
              + "WARC-Record-ID: <"),
        rid,
        F.lit(">" + _CRLF + "WARC-Date: "), date,
        F.lit(_CRLF + "WARC-Target-URI: "), uri,
        F.lit(_CRLF), refers,
        F.lit("Content-Type: " + content_type + _CRLF + "Content-Length: "),
        F.octet_length(body).cast("string"),
        F.lit(_CRLF + _CRLF), body, F.lit(_CRLF + _CRLF))


def wet_record_expr(uri_col, date_col, text_col, refers_to_col=None):
    """One WET record (``WARC-Type: conversion``, ``text/plain`` body):
    the Common-Crawl extracted-text derivative of a response record.
    ``text_col`` is the extracted text (string); ``refers_to_col``
    optionally carries the source response record's id."""
    return _derivative_record_expr(
        "conversion", "text/plain", "wet",
        uri_col, date_col, text_col, refers_to_col)


def wat_record_expr(uri_col, date_col, json_col, refers_to_col=None):
    """One WAT record (``WARC-Type: metadata``, ``application/json``
    body): the Common-Crawl metadata derivative.  ``json_col`` is an
    already-serialized JSON string (build it with
    ``F.to_json(F.struct(...))`` so field order — and therefore the
    record bytes — is deterministic)."""
    return _derivative_record_expr(
        "metadata", "application/json", "wat",
        uri_col, date_col, json_col, refers_to_col)


def revisit_record_expr(uri_col, date_col, digest_col, refers_to_col):
    """One ``WARC-Type: revisit`` record: the archive-side dedup form —
    a recrawl whose payload digest matches a prior capture stores NO
    body, only ``WARC-Payload-Digest`` (md5 hex here; production CC
    uses sha1 base32 — same contract, different hash) plus
    ``WARC-Refers-To`` naming the original record and the
    identical-payload-digest profile.  ``resolve_revisits`` re-attaches
    the referenced body on the read side."""
    uri, date = F.col(uri_col), F.col(date_col)
    digest = F.col(digest_col)
    rid = F.concat(F.lit("urn:md5:"),
                   F.md5(F.concat_ws("\x1f", F.lit("revisit"), uri, date,
                                     digest)))
    return F.concat(
        F.lit("WARC/1.0" + _CRLF + "WARC-Type: revisit" + _CRLF
              + "WARC-Record-ID: <"),
        rid,
        F.lit(">" + _CRLF + "WARC-Date: "), date,
        F.lit(_CRLF + "WARC-Target-URI: "), uri,
        F.lit(_CRLF + "WARC-Refers-To: <"), F.col(refers_to_col),
        F.lit(">" + _CRLF + "WARC-Payload-Digest: md5:"), digest,
        F.lit(_CRLF + "WARC-Profile: http://netpreserve.org/warc/1.0/"
              "revisit/identical-payload-digest" + _CRLF
              + "Content-Length: 0" + _CRLF + _CRLF + _CRLF + _CRLF))


_PARSE_SCHEMA = ("record_id string, warc_type string, target_uri string, "
                 "warc_date string, refers_to string, payload_digest "
                 "string, warc_content_type "
                 "string, http_status int, http_content_type "
                 "string, body binary, err string")


def _parse_blob(blob: bytes):
    """Yield one tuple per record in a concatenated-record blob."""
    pos, n = 0, len(blob)
    while pos < n:
        if blob[pos:pos + 2] == b"\r\n":          # inter-record slack
            pos += 2
            continue
        head_end = blob.find(b"\r\n\r\n", pos)
        if not blob.startswith(b"WARC/", pos) or head_end < 0:
            yield (None, None, None, None, None, None, None, None, None,
                   None,
                   f"malformed record header at offset {pos}")
            return
        headers = {}
        lines = blob[pos:head_end].split(b"\r\n")
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            yield (None, None, None, None, None, None, None, None, None,
                   None,
                   f"missing/invalid Content-Length at offset {pos}")
            return
        block = blob[head_end + 4:head_end + 4 + clen]
        if len(block) < clen:
            yield (None, None, None, None, None, None, None, None, None,
                   None,
                   f"truncated record at offset {pos}")
            return
        pos = head_end + 4 + clen
        rid = headers.get(b"warc-record-id", b"").strip(b"<>").decode(
            "utf-8", "replace") or None
        wtype = headers.get(b"warc-type", b"").decode("utf-8",
                                                      "replace") or None
        uri = headers.get(b"warc-target-uri")
        uri = uri.decode("utf-8", "replace") if uri is not None else None
        wdate = headers.get(b"warc-date")
        wdate = wdate.decode("ascii", "replace") if wdate is not None else None
        refers = headers.get(b"warc-refers-to", b"").strip(b"<>").decode(
            "utf-8", "replace") or None
        pdigest = headers.get(b"warc-payload-digest", b"").decode(
            "ascii", "replace") or None
        wctype = headers.get(b"content-type")
        wctype = (wctype.decode("utf-8", "replace")
                  if wctype is not None else None)
        status = ctype = body = None
        if (headers.get(b"content-type", b"")
                .startswith(b"application/http") and block[:5] == b"HTTP/"):
            hh_end = block.find(b"\r\n\r\n")
            hh_end = hh_end if hh_end >= 0 else len(block)
            hlines = block[:hh_end].split(b"\r\n")
            parts = hlines[0].split(b" ", 2)
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            for ln in hlines[1:]:
                k, _, v = ln.partition(b":")
                if k.strip().lower() == b"content-type":
                    ctype = v.strip().decode("utf-8", "replace")
            body = block[hh_end + 4:] if hh_end + 4 <= len(block) else b""
        else:
            body = block
        yield (rid, wtype, uri, wdate, refers, pdigest, wctype, status,
               ctype, body, None)


_HEADER_SCHEMA = ("record_id string, warc_type string, target_uri string, "
                  "warc_date string, http_status int, err string")


def _walk_headers(blob: bytes):
    """Envelope-only record walk: the same traversal as ``_parse_blob``
    but bodies are SKIPPED via Content-Length (never sliced, decoded, or
    copied) and only the fields the latest-crawl resolution needs are
    parsed.  The err taxonomy on malformed/truncated input is identical
    to the full parser's so both passes agree on which records exist."""
    pos, n = 0, len(blob)
    while pos < n:
        if blob[pos:pos + 2] == b"\r\n":          # inter-record slack
            pos += 2
            continue
        head_end = blob.find(b"\r\n\r\n", pos)
        if not blob.startswith(b"WARC/", pos) or head_end < 0:
            yield (None, None, None, None, None,
                   f"malformed record header at offset {pos}")
            return
        rid = wtype = uri = wdate = None
        clen = -1
        is_http = False
        for ln in blob[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = ln.partition(b":")
            k = k.strip().lower()
            if k == b"content-length":
                try:
                    clen = int(v.strip())
                except ValueError:
                    clen = -1
            elif k == b"warc-record-id":
                rid = v.strip().strip(b"<>").decode("utf-8",
                                                    "replace") or None
            elif k == b"warc-type":
                wtype = v.strip().decode("utf-8", "replace") or None
            elif k == b"warc-target-uri":
                uri = v.strip().decode("utf-8", "replace")
            elif k == b"warc-date":
                wdate = v.strip().decode("ascii", "replace")
            elif k == b"content-type":
                is_http = v.strip().startswith(b"application/http")
        if clen < 0:
            yield (None, None, None, None, None,
                   f"missing/invalid Content-Length at offset {pos}")
            return
        body_start = head_end + 4
        if body_start + clen > n:
            yield (None, None, None, None, None,
                   f"truncated record at offset {pos}")
            return
        status = None
        if is_http and blob[body_start:body_start + 5] == b"HTTP/":
            line_end = blob.find(b"\r\n", body_start,
                                 body_start + min(clen, 256))
            line_end = line_end if line_end >= 0 else body_start + clen
            parts = blob[body_start:line_end].split(b" ", 2)
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
        pos = body_start + clen
        yield (rid, wtype, uri, wdate, status, None)


def parse_warc_headers(df: DataFrame, warc_col: str = "warc") -> DataFrame:
    """Narrow twin of ``parse_warc``: one row per record with ONLY the
    envelope fields ``record_id, warc_type, target_uri, warc_date,
    http_status, err`` — bodies are length-skipped, never materialized.
    This is the cheap first pass that lets latest-crawl resolution
    shuffle keys instead of page bodies (jobs/crawl_ingest_job)."""
    import pandas as pd

    def kernel(batches) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[tuple] = []
            for blob in pdf[warc_col]:
                if blob is None:
                    out.append((None,) * 5 + ("null archive",))
                    continue
                out.extend(_walk_headers(bytes(blob)))
            yield pd.DataFrame(out, columns=[
                "record_id", "warc_type", "target_uri", "warc_date",
                "http_status", "err"])

    return df.select(warc_col).mapInPandas(kernel, schema=_HEADER_SCHEMA)


def parse_warc(df: DataFrame, warc_col: str = "warc",
               keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """One row per WARC record found in the binary column ``warc_col``
    (each value may hold a whole multi-record archive).  Output columns:
    ``record_id, warc_type, target_uri, warc_date, refers_to,
    payload_digest, warc_content_type, http_status, http_content_type,
    body, err``
    plus any ``keep_cols`` carried through from the input row.
    ``http_*`` fields parse only for ``application/http`` blocks;
    derivative records (WET/WAT) surface their payload in ``body`` and
    their type in ``warc_content_type``.  Malformed/truncated tails
    produce a row with ``err`` set and the rest null — never a task
    failure."""
    import pandas as pd

    keep_types = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in keep_cols)
    schema = (keep_types + ", " if keep_types else "") + _PARSE_SCHEMA
    cols = list(keep_cols) + [warc_col]

    def kernel(batches) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[tuple] = []
            for row in zip(*(pdf[c] for c in cols)):
                keep, blob = row[:-1], row[-1]
                if blob is None:
                    out.append(keep + (None,) * 10 + ("null archive",))
                    continue
                blob = bytes(blob)
                for rec in _parse_blob(blob):
                    out.append(keep + rec)
            names = list(keep_cols) + [
                "record_id", "warc_type", "target_uri", "warc_date",
                "refers_to", "payload_digest", "warc_content_type",
                "http_status", "http_content_type", "body", "err"]
            yield pd.DataFrame(out, columns=names)

    return df.select(*cols).mapInPandas(kernel, schema=schema)


def resolve_revisits(recs: DataFrame) -> DataFrame:
    """Re-attach bodies to ``revisit`` records from the response record
    each one references: the read-side half of the archive dedup
    contract (``revisit_record_expr`` writes the storage-side half).

    Output = input columns + ``was_revisit`` boolean; a revisit row
    gets the referenced response's body/status/content-type, and a
    revisit whose reference is missing from the batch surfaces as an
    err row (quarantine contract) rather than a silent empty body.

    Scale shape: only the revisit rows (a small fraction of a crawl)
    join against the response records, keyed on the record id — one
    keyed shuffle, bodies ride it once."""
    is_revisit = F.coalesce(F.col("warc_type"), F.lit("")) == "revisit"
    resp = (recs.where((F.col("warc_type") == "response")
                       & F.col("err").isNull())
            .select(F.col("record_id").alias("__rid"),
                    F.col("body").alias("__body"),
                    F.col("http_status").alias("__status"),
                    F.col("http_content_type").alias("__ctype")))
    others = recs.where(~is_revisit).withColumn(
        "was_revisit", F.lit(False))
    rev = recs.where(is_revisit)
    cols = recs.columns
    resolved = (rev.join(resp, rev["refers_to"] == resp["__rid"], "left")
                .select(
                    *[c for c in cols
                      if c not in ("body", "http_status",
                                   "http_content_type", "err")],
                    F.col("__body").alias("body"),
                    F.col("__status").alias("http_status"),
                    F.col("__ctype").alias("http_content_type"),
                    F.when(F.col("__rid").isNull(),
                           F.concat(F.lit("revisit: unresolved reference "),
                                    F.coalesce(F.col("refers_to"),
                                               F.lit("<none>"))))
                     .otherwise(F.col("err")).alias("err"))
                .withColumn("was_revisit", F.lit(True)))
    order = cols + ["was_revisit"]
    return others.select(*order).unionByName(resolved.select(*order))
