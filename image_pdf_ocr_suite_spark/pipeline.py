"""End-to-end extraction pipeline over the Common-Crawl-style pages table.

Dataflow (all DataFrame API; two mapInPandas kernels, everything else
Catalyst):

    scan (url, html)                       -- column-pruned binary scan
      -> decode kernel                     -- sniff + per-page explode
      -> salted repartition                -- xxhash64(url, page) spreads
         (skew defuse)                        giant docs across tasks
      -> OCR kernel (spdf pages)           -- vectorized adaptive OCR
      -> assembly (groupBy url)            -- headers + join/strip (Catalyst)
      -> spans (explode + window)          -- searchable-text offsets
      -> metrics (groupBy pid)             -- lineage table
    HTML rows -> density-strip kernel      -- boilerplate removal
    encrypted/corrupt/unknown -> quarantine rows (never task failures)

At 100 TB the only data-sized shuffles are the page repartition and the
per-url assembly groupBy; both key on (url[, page]) which is high-cardinality
and salt-friendly.  AQE handles residual skew (session.py enables it).
"""

from __future__ import annotations

from dataclasses import dataclass
from uuid import uuid4

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.config import ExtractConfig
from image_pdf_ocr_suite_spark.kernels.decode import decode_pages
from image_pdf_ocr_suite_spark.kernels.html import strip_html
from image_pdf_ocr_suite_spark.kernels.ocr import ocr_pages
from image_pdf_ocr_suite_spark.relational.assemble import (
    assemble_documents,
    emit_spans,
    empty_docs,
    partition_metrics,
)


@dataclass
class ExtractResult:
    text: DataFrame        # url, extracted_text, n_pages, kind
    spans: DataFrame       # url, page, block..word, boxes, conf, text, offsets
    metrics: DataFrame     # run_id, partition_id, counts, mean_conf, ...
    quarantine: DataFrame  # url, kind, error
    pages: DataFrame       # per-page OCR rows (for downstream analytics)


def extract_pages(df: DataFrame, cfg: ExtractConfig | None = None,
                  run_id: str | None = None) -> ExtractResult:
    cfg = cfg or ExtractConfig()
    run_id = run_id or uuid4().hex[:12]

    decoded = decode_pages(df)

    ocr_input = decoded.where((F.col("kind") == "spdf") & (F.col("page") > 0))
    if cfg.explode_pages:
        # Salted url-hash partitioning (north_star): page number acts as the
        # salt, so a 2000-page scanned lecture PDF fans out over the cluster.
        keys = [F.xxhash64("url", "page")]
        if cfg.salt_buckets:
            keys = [F.pmod(F.xxhash64("url", "page"), F.lit(cfg.salt_buckets))]
        ocr_input = ocr_input.repartition(*keys)
    else:
        ocr_input = ocr_input.repartition(F.xxhash64("url"))

    ocr_df = ocr_pages(ocr_input, cfg)

    text_ocr = assemble_documents(ocr_df).withColumn("kind", F.lit("spdf"))
    text_empty = empty_docs(decoded).withColumn("kind", F.lit("spdf"))
    html_rows = decoded.where(F.col("kind") == "html")
    text_html = strip_html(html_rows).select(
        "url",
        F.col("main_text").alias("extracted_text"),
        F.lit(1).alias("n_pages"),
        F.lit("html").alias("kind"),
    )
    text = text_ocr.unionByName(text_empty).unionByName(text_html)

    quarantine = decoded.where(
        F.col("kind").isin("encrypted", "corrupt", "unknown")
    ).select("url", "kind", "error")

    spans = emit_spans(ocr_df, cfg)
    metrics = partition_metrics(ocr_df, quarantine, run_id)

    return ExtractResult(text=text, spans=spans, metrics=metrics,
                         quarantine=quarantine, pages=ocr_df)
