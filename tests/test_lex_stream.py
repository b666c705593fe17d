"""Streaming inverted-index ingest (streaming/lex_stream.py).

Pins: live BM25 through the streamed index == the batch bm25_scores
over the static union BIT for bit (same scoring spelling, disjoint-doc
union merge), the compacted serving layout answers identically via the
partitioned probe, the replay guard makes a re-delivered micro-batch a
no-op, and an uncommitted index reads as empty."""

from __future__ import annotations

from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import lexindex
from image_pdf_ocr_suite_spark.analytics import text as textops
from image_pdf_ocr_suite_spark.streaming.lex_stream import (
    compact_to_serving, live_bm25, live_constants, start_lex_index_stream)
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable

SCHEMA = "doc_id long, text string"
TERMS = ["hash", "join", "filter", "zebra"]


def _docs(spark):
    words = ["hash", "join", "filter", "scan", "sort", "zebra"]
    rows = [(i, " ".join(words[(i + j) % len(words)]
                         for j in range(i % 7))) for i in range(90)]
    rows.append((90, None))
    return spark.createDataFrame(rows, SCHEMA)


def _run_stream(spark, docs, tmp_path, tag="s1"):
    input_dir = str(tmp_path / f"in_{tag}")
    docs.where("doc_id < 30").coalesce(1).write.mode("append").parquet(input_dir)
    docs.where("doc_id >= 30 AND doc_id < 70").coalesce(1) \
        .write.mode("append").parquet(input_dir)
    docs.where("doc_id >= 70").coalesce(1).write.mode("append").parquet(input_dir)
    out_root = str(tmp_path / f"out_{tag}")
    q = start_lex_index_stream(spark, input_dir, SCHEMA, out_root,
                               str(tmp_path / f"ckpt_{tag}"))
    q.awaitTermination(120)
    return out_root


def test_live_bm25_matches_batch_bitwise(spark, tmp_path):
    docs = _docs(spark)
    out_root = _run_stream(spark, docs, tmp_path)
    n, s, b = live_constants(spark, out_root)
    assert n == docs.count() and b == 16
    got = {r["doc_id"]: (r["n_terms_hit"], r["score"])
           for r in live_bm25(spark, out_root, TERMS).collect()}
    exp = {r["doc_id"]: (r["n_terms_hit"], r["score"])
           for r in textops.bm25_scores(docs, TERMS)
                           .where("n_terms_hit >= 1").collect()}
    assert got == exp                   # exact doubles, not rounded


def test_compacted_layout_answers_identically(spark, tmp_path):
    docs = _docs(spark)
    out_root = _run_stream(spark, docs, tmp_path, tag="s2")
    path = str(tmp_path / "serving")
    stats = compact_to_serving(spark, out_root, path)
    assert stats["n_docs"] == docs.count()
    got = {r["doc_id"]: (r["n_terms_hit"], r["score"])
           for r in lexindex.bm25_from_index(spark, path, TERMS).collect()}
    exp = {r["doc_id"]: (r["n_terms_hit"], r["score"])
           for r in live_bm25(spark, out_root, TERMS).collect()}
    assert got == exp


def test_replayed_batch_is_noop(spark, tmp_path):
    docs = _docs(spark)
    out_root = _run_stream(spark, docs, tmp_path, tag="s3")
    posts_table = SnapshotTable(f"{out_root}/lex_postings")
    before = posts_table.read(spark).count()
    n_before = live_constants(spark, out_root)
    # re-deliver every batch: fresh checkpoint, same input, same ids
    input_dir = str(tmp_path / "in_s3")
    q = start_lex_index_stream(spark, input_dir, SCHEMA, out_root,
                               str(tmp_path / "ckpt_s3b"))
    q.awaitTermination(120)
    assert posts_table.read(spark).count() == before
    assert live_constants(spark, out_root) == n_before


def test_uncommitted_index_reads_empty(spark, tmp_path):
    out_root = str(tmp_path / "never_started")
    assert live_constants(spark, out_root) == (0, 0, 0)
    assert live_bm25(spark, out_root, TERMS).count() == 0
    # compacting a never-started stream yields a READABLE empty layout
    # (an empty partitionBy write would leave a schema-less directory)
    path = str(tmp_path / "empty_serving")
    compact_to_serving(spark, out_root, path)
    assert lexindex.bm25_from_index(spark, path, TERMS).count() == 0
