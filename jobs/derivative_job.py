"""Derivative-export job — the pages table -> WET + WAT archives.

The inverse of jobs/crawl_ingest_job.py: given the north-rule pages
table ``(url, warc_ts, html, text, lang)`` it emits the two
Common-Crawl derivative products as sharded multi-record archives:

    WET  (WARC-Type: conversion)  — extracted text per page
    WAT  (WARC-Type: metadata)    — JSON metadata per page
                                    (url, lang, text/html octet lengths,
                                     link count from the link miner)

Both record writers are pure-Catalyst string expressions
(tableio/warc.py); the only Python stage is the link miner feeding the
WAT link counts, and the only shuffle is the shard grouping:

    pages -> extract_links (map-only kernel) -> per-url link counts
          -> WET/WAT record expressions (Catalyst)
          -> groupBy(shard = url-hash bucket)   <- the ONE shuffle
          -> archives (shard, n_records, wet, wat)

Records concatenate in (url) order inside each shard, so a rebuilt
archive is byte-identical — the determinism contract every sink in
this repo carries.  Shard count is the scale knob: at 10^12 documents
pick shards so each archive stays in the usual CC file range
(~100-500 MB); the shuffle carries only the finished record strings.

    spark-submit --py-files pkg.zip jobs/derivative_job.py \
        --pages-table pages.parquet --output-root /out \
        [--shards 64] [--run-id RID]
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, functions as F

from image_pdf_ocr_suite_spark.session import build_session
from image_pdf_ocr_suite_spark.tableio import warc
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable


def derivative_archives(pages: DataFrame, n_shards: int = 64,
                        count_links: bool = True) -> DataFrame:
    """pages -> one row per shard: ``(shard, n_records, wet, wat)``
    with both archives as UTF-8 binary multi-record blobs."""
    from image_pdf_ocr_suite_spark.kernels.html import extract_links

    if count_links:
        links = (extract_links(pages.select("url", "html"))
                 .groupBy("url").agg(F.count(F.lit(1)).alias("n_links")))
        pages = pages.join(links, "url", "left").withColumn(
            "n_links", F.coalesce("n_links", F.lit(0)))
    else:
        pages = pages.withColumn("n_links", F.lit(0).cast("bigint"))

    p = pages.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("wdate"),
        F.decode("html", "UTF-8").alias("body"),
        F.coalesce(F.col("text"), F.lit("")).alias("wet_text"),
        "lang", "n_links",
        F.octet_length("html").alias("html_octets"))
    p = p.withColumn(
        "resp_id", warc.response_record_id_expr("url", "wdate", "body"))
    p = p.withColumn("wat_json", F.to_json(F.struct(
        F.col("url").alias("url"),
        F.col("lang").alias("lang"),
        F.col("html_octets").alias("html_octets"),
        F.octet_length("wet_text").alias("text_octets"),
        F.col("n_links").alias("n_links"))))
    wet_rec = warc.wet_record_expr("url", "wdate", "wet_text", "resp_id")
    wat_rec = warc.wat_record_expr("url", "wdate", "wat_json", "resp_id")

    rows = p.select(
        F.pmod(F.xxhash64("url"), F.lit(n_shards)).alias("shard"),
        F.struct(F.col("url"), wet_rec.alias("wet"), wat_rec.alias("wat"))
         .alias("s"))
    return (rows.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_records"),
                 F.encode(F.array_join(F.transform(
                     F.array_sort(F.collect_list("s")), lambda x: x["wet"]),
                     ""), "UTF-8").alias("wet"),
                 F.encode(F.array_join(F.transform(
                     F.array_sort(F.collect_list("s")), lambda x: x["wat"]),
                     ""), "UTF-8").alias("wat")))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages-table", required=True)
    ap.add_argument("--output-root", required=True)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--no-links", action="store_true",
                    help="skip the link-count stage (WAT n_links = 0)")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = build_session(app="derivative_job", master=args.master)
    pages = spark.read.parquet(args.pages_table)
    out = derivative_archives(pages, n_shards=args.shards,
                              count_links=not args.no_links)
    import uuid
    SnapshotTable(f"{args.output_root}/derivatives").append(
        out, run_id=args.run_id or uuid.uuid4().hex)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
