"""Streaming windowed aggregation with watermark: append-mode windows
finalize and match the batch equivalent."""

import pytest
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark import fixtures
from image_pdf_ocr_suite_spark.streaming.stream import (
    read_pages_stream,
    windowed_crawl_counts,
)

DOC_ROWS = [(i, f"t{i} body words here", "ja" if i % 2 else "en") for i in range(60)]


def test_windowed_counts_match_batch(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    pdf = fixtures.build_pages_pdf(DOC_ROWS)
    # fixture timestamps step 1 minute per doc -> 60 minutes of "crawl"
    spark.createDataFrame(pdf).coalesce(2).write.parquet(input_dir)

    stream = read_pages_stream(spark, input_dir)
    agg = windowed_crawl_counts(stream, window_minutes=10, watermark_minutes=5)
    q = (agg.writeStream.format("memory").queryName("wcounts")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["window_start"], r["lang"]): (r["n_docs"], r["payload_bytes"])
           for r in spark.sql("select * from wcounts").collect()}

    batch = (spark.read.parquet(input_dir)
             .groupBy(F.window("warc_ts", "10 minutes").alias("w"), "lang")
             .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("html")).alias("b")))
    expected = {(r["w"]["start"], r["lang"]): (r["n"], r["b"])
                for r in batch.collect()}

    # append mode emits only windows the watermark has passed; everything
    # emitted must match the batch truth, and most windows must be present
    assert got
    for k, v in got.items():
        assert expected[k] == v
    assert len(got) >= len(expected) - 2  # the tail windows may be held back
