"""Derivative-export job (jobs/derivative_job.py): pages -> WET/WAT
archives whose records parse back exactly, with link counts, byte
determinism, and sharding pinned."""

import json

from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.tableio import warc
from jobs.derivative_job import derivative_archives


def _pages(spark):
    rows = []
    for i in range(12):
        html = (f'<html><body><p>doc {i} text</p>'
                + '<a href="/x">x</a>' * (i % 3)
                + "</body></html>").encode()
        rows.append((f"https://h{i % 4}.example/p{i}",
                     "2026-03-01 00:00:00", bytearray(html),
                     f"doc {i} text", "en" if i % 2 else "ja"))
    return spark.createDataFrame(
        rows, "url string, warc_ts string, html binary, text string, "
              "lang string") \
        .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))


def test_wet_wat_archives_roundtrip(spark):
    pages = _pages(spark)
    out = derivative_archives(pages, n_shards=3).collect()
    assert sum(r["n_records"] for r in out) == 12

    blob_df = spark.createDataFrame(
        [(bytearray(bytes(r["wet"])),) for r in out], "warc binary")
    wet = warc.parse_warc(blob_df, "warc").collect()
    assert len(wet) == 12
    assert all(r["warc_type"] == "conversion" and r["err"] is None
               for r in wet)
    by_url = {r["target_uri"]: bytes(r["body"]).decode() for r in wet}
    assert by_url["https://h1.example/p1"] == "doc 1 text"

    blob_df = spark.createDataFrame(
        [(bytearray(bytes(r["wat"])),) for r in out], "warc binary")
    wat = warc.parse_warc(blob_df, "warc").collect()
    assert len(wat) == 12
    metas = {r["target_uri"]: json.loads(bytes(r["body"]).decode())
             for r in wat}
    m = metas["https://h2.example/p2"]
    assert m["n_links"] == 2 and m["lang"] == "ja"
    assert m["text_octets"] == len("doc 2 text")
    # derivatives reference the same deterministic response id
    wet_refs = {r["target_uri"]: r["refers_to"] for r in wet}
    wat_refs = {r["target_uri"]: r["refers_to"] for r in wat}
    assert wet_refs == wat_refs
    assert all(v and v.startswith("urn:md5:") for v in wet_refs.values())


def test_archives_byte_deterministic(spark):
    pages = _pages(spark)
    a = {r["shard"]: (bytes(r["wet"]), bytes(r["wat"]))
         for r in derivative_archives(pages, n_shards=3).collect()}
    b = {r["shard"]: (bytes(r["wet"]), bytes(r["wat"]))
         for r in derivative_archives(
             pages.repartition(7), n_shards=3).collect()}
    assert a == b                      # partitioning-invariant bytes


def test_no_links_mode(spark):
    out = derivative_archives(_pages(spark), n_shards=2,
                              count_links=False).collect()
    blob_df = spark.createDataFrame(
        [(bytearray(bytes(r["wat"])),) for r in out], "warc binary")
    wat = warc.parse_warc(blob_df, "warc").collect()
    assert all(json.loads(bytes(r["body"]).decode())["n_links"] == 0
               for r in wat)
