"""Crawl-ingestion job — WARC archives -> the Common-Crawl pages table.

    archives table (warc: binary; each blob = one or many records)
      -> WARC record walk                      tableio.warc.parse_warc
      -> response filter + reject accounting   (parse err / non-response
                                                skipped / missing uri /
                                                non-2xx status)
      -> re-crawl resolution                   latest warc_ts per url
      -> charset-aware decode + main-content   kernels.charset +
         strip (one fused Python stage)        kernels.html
      -> script language ID                    analytics.text
      -> (url, warc_ts, html, text, lang)      the north-rule input shape
      -> snapshot-committed pages table + reject log

This is the upstream half of the corpus path: it MATERIALIZES the
pages table that the extraction pipeline and jobs/corpus_job.py
consume, straight from raw crawl archives.  Scale shape: the record
walk and decode/strip are map-only Arrow kernels (no shuffle); the
only data-sized shuffle is the per-url latest-crawl window, keyed on
url — the same key the downstream pipeline salts on.

    spark-submit --py-files pkg.zip jobs/crawl_ingest_job.py \
        --input-table archives.parquet --output-root /out \
        [--keep-all-recrawls] [--run-id RID]
"""

from __future__ import annotations

import argparse
import sys
import uuid
from typing import Iterator

from pyspark.sql import DataFrame, Window, functions as F

from image_pdf_ocr_suite_spark.session import build_session
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable
from image_pdf_ocr_suite_spark.tableio.warc import parse_warc

_PAGE_SCHEMA = ("record_id string, url string, warc_ts timestamp, "
                "html binary, text string, lang string")


def _page_text_kernel(batches) -> Iterator:
    """(record_id, url, warc_ts, html) -> + text, lang: charset-aware
    decode, DOM text-density boilerplate strip, and script lang-ID
    fused in ONE Arrow stage.  Lang-ID used to be a separate pandas-UDF
    projection after this kernel; chaining a second Python crossing per
    page measurably anti-scaled (the +14 s lang stage cost the same
    wall at 16 cores as at 4 on 2.56M pages) — fusing it makes the
    whole decode path one JVM<->Python round trip.

    Binary image-PDF payloads (SPDF magic — the same sniff
    kernels/decode.py uses) are NOT text: their ``text`` stays NULL and
    ``lang`` reads ``unknown``, with the payload preserved in ``html``
    so the OCR pipeline (``extract_pages``) picks them up downstream —
    the crawl→extraction composition the north rule describes.
    Shredding them through the charset ladder + HTML stripper would
    emit mojibake text for every scanned-PDF capture in the crawl."""
    import pandas as pd

    from image_pdf_ocr_suite_spark.analytics.text import classify_script
    from image_pdf_ocr_suite_spark.kernels.charset import decode_bytes
    from image_pdf_ocr_suite_spark.kernels.html import extract_main_text
    from image_pdf_ocr_suite_spark.payload import MAGIC as _SPDF

    for pdf in batches:
        texts = [None if raw is not None and bytes(raw[:4]) == _SPDF
                 else extract_main_text(decode_bytes(raw)[0])
                 for raw in pdf["html"]]
        yield pd.DataFrame({
            "record_id": pdf["record_id"], "url": pdf["url"],
            "warc_ts": pdf["warc_ts"], "html": pdf["html"],
            "text": texts, "lang": classify_script(texts)})


def ingest_pages(archives: DataFrame, warc_col: str = "warc",
                 keep_latest: bool = True,
                 resolve_revisits: bool = False,
                 latest_plan: str = "narrow",
                 ) -> tuple[DataFrame, DataFrame]:
    """archives -> (pages, rejects).

    pages: ``(url, warc_ts, html, text, lang)`` — one row per usable
    response record (per url's LATEST crawl when ``keep_latest``).
    rejects: ``(url, reason)`` with url null for parse errors that
    precede a usable URI.  Non-response record types (request,
    metadata, warcinfo) are silently skipped — they are siblings of a
    response, not failures of one.

    ``resolve_revisits=True`` additionally ingests ``revisit`` records
    (archive-side dedup: a recrawl stored digest-only) by re-attaching
    the referenced response's body (tableio.warc.resolve_revisits);
    an unresolvable revisit lands in rejects.  Off by default — the
    resolution join costs a record-id shuffle that archives without
    revisit records shouldn't pay.

    ``latest_plan`` picks how the latest-crawl window is executed:

    - ``"narrow"`` (default): a second envelope-only pass over the
      archives (``parse_warc_headers`` — bodies length-skipped, never
      materialized) ranks ``(record_id, url, warc_ts)`` and yields the
      SUPERSEDED MINORITY; pages anti-join it on record_id, so bodies
      never ride a shuffle — the loser set (superseded records of ONE
      ingest batch, not of crawl history) is broadcast explicitly.  The anti-join key is the composite
      ``(record_id, url, warc_ts)``, so even a (spec-violating) record
      id reused across a url's crawls resolves exactly as the window
      plan does; only fully-identical sort keys (same id AND timestamp
      under one url) are ambiguous — and the window plan's own
      row_number is nondeterministic there too.  A pathological loser
      fraction (re-ingesting deep crawl history in one batch) could
      outgrow a broadcast — that is what ``"window"`` is for.
    - ``"window"``: rank bodies directly with one url-keyed
      ``row_number`` shuffle — no second scan, but every body rides
      the shuffle.  Used automatically when ``resolve_revisits`` is on
      (resolved revisits change which records enter the window, and
      the envelope pass cannot see resolution outcomes); also the
      right choice for archives with non-unique record ids."""
    from image_pdf_ocr_suite_spark.partitioning import fan_out_small

    # round 6: a compact archive table (single row group) scans as one
    # task, serializing BOTH the record-walk kernel and the envelope
    # pass; no-op when the archive scan already has real parallelism
    archives = fan_out_small(archives)
    recs = parse_warc(archives, warc_col=warc_col)
    if resolve_revisits:
        from image_pdf_ocr_suite_spark.tableio.warc import (
            resolve_revisits as _resolve)
        recs = _resolve(recs).withColumn(
            "warc_type",
            F.when(F.col("was_revisit") & F.col("err").isNull(),
                   F.lit("response")).otherwise(F.col("warc_type")))

    parse_err = recs.where(F.col("err").isNotNull()).select(
        F.col("target_uri").alias("url"),
        F.concat(F.lit("warc: "), F.col("err")).alias("reason"))
    resp = recs.where(F.col("err").isNull()
                      & (F.col("warc_type") == "response"))
    no_uri = resp.where(F.col("target_uri").isNull()).select(
        F.col("target_uri").alias("url"),
        F.lit("missing target uri").alias("reason"))
    resp = resp.where(F.col("target_uri").isNotNull())
    ok_status = (F.col("http_status") >= 200) & (F.col("http_status") < 300)
    bad_status = resp.where(~F.coalesce(ok_status, F.lit(False))).select(
        F.col("target_uri").alias("url"),
        F.concat(F.lit("http status "),
                 F.coalesce(F.col("http_status").cast("string"),
                            F.lit("none"))).alias("reason"))
    good = resp.where(F.coalesce(ok_status, F.lit(False)))

    pages = good.select(
        F.col("record_id"), F.col("target_uri").alias("url"),
        F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ssX")
        .alias("warc_ts"),
        F.col("body").alias("html"))
    rejects = parse_err.unionByName(no_uri).unionByName(bad_status)

    if keep_latest:
        w = Window.partitionBy("url").orderBy(
            F.desc("warc_ts"), F.asc("record_id"))
        if latest_plan == "narrow" and not resolve_revisits:
            from image_pdf_ocr_suite_spark.tableio.warc import (
                parse_warc_headers)
            hdr = parse_warc_headers(archives, warc_col=warc_col)
            cand = hdr.where(
                F.col("err").isNull()
                & (F.col("warc_type") == "response")
                & F.col("target_uri").isNotNull()
                & F.coalesce(ok_status, F.lit(False))).select(
                "record_id", F.col("target_uri").alias("url"),
                F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ssX")
                .alias("warc_ts"))
            losers = (cand.withColumn("__rn", F.row_number().over(w))
                      .where(F.col("__rn") > 1)
                      .select("record_id", "url", "warc_ts"))
            rejects = rejects.unionByName(
                losers.select("url", F.lit("superseded recrawl")
                              .alias("reason")))
            # composite key: robust even to a (spec-violating) record id
            # shared across a url's crawls — the warc_ts tiebreak keeps
            # exactly the rows the window plan keeps.  The broadcast is
            # EXPLICIT: leaving it to AQE still materializes the pages
            # side's shuffle write (stages run before the join replans),
            # which is the exact body shuffle this plan exists to avoid.
            pages = pages.join(F.broadcast(losers),
                               ["record_id", "url", "warc_ts"],
                               "left_anti")
        else:
            ranked = pages.withColumn("__rn", F.row_number().over(w))
            rejects = rejects.unionByName(
                ranked.where(F.col("__rn") > 1)
                .select("url", F.lit("superseded recrawl").alias("reason")))
            pages = ranked.where(F.col("__rn") == 1).drop("__rn")

    # decode + strip + lang-ID fused in ONE Arrow stage (a second
    # pandas-UDF projection, like a self-join, would add another Python
    # crossing per page — measured barely scaling 4->16 cores)
    pages = pages.mapInPandas(_page_text_kernel, schema=_PAGE_SCHEMA)
    pages = pages.select("url", "warc_ts", "html", "text", "lang")
    return pages, rejects


def crawl_delta(old_pages: DataFrame, new_pages: DataFrame,
                url_col: str = "url",
                payload_col: str = "html") -> DataFrame:
    """Snapshot-to-snapshot crawl delta: classify every url across two
    pages tables (e.g. two monthly crawls of the same seed list) as
    ``added`` (new only), ``gone`` (old only), ``changed`` (payload
    digest differs), or ``unchanged``.  Returns
    ``(url, status, old_digest, new_digest)`` — the input to recrawl
    scheduling (prioritize ``changed`` hosts) and to incremental
    downstream processing (only ``added``/``changed`` pages re-enter
    the extraction pipeline).

    Scale shape: the md5 digest is computed map-side on each scan, so
    the full-outer url join carries ``(url, 32-char digest)`` rows only
    — page bodies never ride the exchange.  Each side is assumed
    already url-unique (``ingest_pages`` with ``keep_latest`` yields
    exactly that); duplicate urls would fan out in the join as in any
    relational full-outer."""
    o = old_pages.select(F.col(url_col).alias("url"),
                         F.md5(F.col(payload_col)).alias("old_digest"))
    n = new_pages.select(F.col(url_col).alias("url"),
                         F.md5(F.col(payload_col)).alias("new_digest"))
    j = o.join(n, "url", "full_outer")
    status = (F.when(F.col("old_digest").isNull(), F.lit("added"))
              .when(F.col("new_digest").isNull(), F.lit("gone"))
              .when(F.col("old_digest") == F.col("new_digest"),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select("url", status.alias("status"), "old_digest",
                    "new_digest")


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-table", required=True,
                    help="parquet with a binary 'warc' column")
    ap.add_argument("--output-root", required=True)
    ap.add_argument("--keep-all-recrawls", action="store_true",
                    help="keep every crawl of a url instead of only the "
                         "latest warc_ts")
    ap.add_argument("--resolve-revisits", action="store_true",
                    help="ingest revisit records by re-attaching the "
                         "referenced response body")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args(argv)

    spark = build_session(app="crawl-ingest-job")
    run_id = args.run_id or uuid.uuid4().hex[:12]
    pages, rejects = ingest_pages(
        spark.read.parquet(args.input_table),
        keep_latest=not args.keep_all_recrawls,
        resolve_revisits=args.resolve_revisits)
    SnapshotTable(f"{args.output_root}/pages").append(pages, run_id=run_id)
    SnapshotTable(f"{args.output_root}/rejects").append(rejects,
                                                        run_id=run_id)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
