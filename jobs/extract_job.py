"""spark-submit entry point (north_rule packaging).

    zip -r pkg.zip image_pdf_ocr_suite_spark/
    spark-submit --py-files pkg.zip jobs/extract_job.py \
        --input-table /path/to/pages_parquet \
        --output-root /path/to/output \
        --mode text|spans|pdf|all [--resume] [--run-id RID]

Reads the Common-Crawl-style pages table, runs the extraction pipeline,
and appends to snapshot-committed output tables (text + spans + quarantine
+ metrics).  ``--resume`` anti-joins the committed urls of a previous run
(idempotent restart after executor/driver loss — north_rule).

``--mode all`` stages the post-kernel page rows (text-sized, no payloads)
to a run-scoped SnapshotTable ONCE and derives text/spans/metrics from the
staged rows: the OCR kernel executes exactly once per job instead of once
per output materialization (recompute-vs-persist rationale: pipeline.py
module docstring — a staging TABLE, not an in-memory persist, is the
cluster-scale answer).

On a cluster with an Iceberg catalog, replace SnapshotTable with
``df.writeTo(table).append()`` — the pipeline code is unchanged.
"""

from __future__ import annotations

import argparse
import sys
import uuid

from pyspark.sql import SparkSession, functions as F

from image_pdf_ocr_suite_spark import ExtractConfig, extract_pages
from image_pdf_ocr_suite_spark.relational.assemble import (
    assemble_documents,
    emit_spans,
    partition_metrics,
)
from image_pdf_ocr_suite_spark.session import build_session
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable


def run(spark: SparkSession, input_table: str, output_root: str,
        mode: str = "all", resume: bool = False, run_id: str | None = None,
        lang: str = "jpn") -> str:
    """Execute the extraction job on an existing session; returns run_id."""
    run_id = run_id or uuid.uuid4().hex[:12]
    cfg = ExtractConfig(lang=lang)

    pages = spark.read.parquet(input_table)
    text_table = SnapshotTable(f"{output_root}/text")
    quar_table = SnapshotTable(f"{output_root}/quarantine")
    if resume:
        # done = extracted urls ∪ quarantined urls: quarantined payloads are
        # settled (retrying a corrupt payload forever is the wrong default;
        # re-run without --resume to retry them deliberately)
        pages = text_table.remaining_input(pages, "url")
        pages = quar_table.remaining_input(pages, "url")

    def _append(table: SnapshotTable, df) -> None:
        if not df.isEmpty():
            table.append(df, run_id=run_id)

    def _append_once(table: SnapshotTable, df) -> None:
        # idempotent per-(table, run_id) commit: a crash-and-restart with
        # the same --run-id must not double-append any output
        if any(s.run_id == run_id for s in table.snapshots()):
            return
        _append(table, df)

    res = extract_pages(pages, cfg, run_id=run_id)
    if mode == "all":
        # OCR exactly once: stage the kernel rows, derive every output from
        # the staged table (pure-Catalyst tail, no kernel re-execution).
        # Run-scoped root so a --resume append never mixes runs; the staged
        # table is an intermediate — drop _staged_pages/{run_id} after the
        # run (or via snapshot expiry) in production.
        stage = SnapshotTable(f"{output_root}/_staged_pages/{run_id}")
        if not any(s.run_id == run_id for s in stage.snapshots()):
            # coalesce to TWO tasks per slot: a narrow coalesce merges the
            # kernel stage itself, so keep 2x-slots granularity — dynamic
            # load balancing survives (2 tasks/core to steal) while the
            # staged table avoids a 4x small-file tax, and no shuffle of
            # the staged rows is paid (repartition would move them all)
            stage.append(res.pages.coalesce(
                2 * spark.sparkContext.defaultParallelism), run_id=run_id)
        staged = stage.read(spark)
        spdf_rows = staged.where((F.col("kind") == "spdf") & (F.col("page") > 0))
        _append_once(text_table, assemble_documents(staged))
        _append_once(SnapshotTable(f"{output_root}/spans"),
                     emit_spans(spdf_rows, cfg))
        # quarantine needs only the decode kernel (no OCR)
        _append_once(quar_table, res.quarantine)
        _append_once(SnapshotTable(f"{output_root}/metrics"),
                     partition_metrics(spdf_rows, res.quarantine, run_id))
        return run_id

    if mode == "text":
        _append(text_table, res.text)
    if mode == "spans":
        _append(SnapshotTable(f"{output_root}/spans"), res.spans)
    if mode == "pdf":
        from image_pdf_ocr_suite_spark.kernels.pdfsink import emit_searchable_pdfs
        _append(SnapshotTable(f"{output_root}/pdf"),
                emit_searchable_pdfs(pages, cfg))
    _append(quar_table, res.quarantine)
    _append(SnapshotTable(f"{output_root}/metrics"), res.metrics)
    return run_id


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-table", required=True)
    ap.add_argument("--output-root", required=True)
    ap.add_argument("--mode", choices=["text", "spans", "pdf", "all"], default="all")
    ap.add_argument("--resume", action="store_true",
                    help="skip urls already committed to the text table")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--lang", default="jpn")
    args = ap.parse_args(argv)

    spark = build_session(app="extract-job")
    run(spark, args.input_table, args.output_root, mode=args.mode,
        resume=args.resume, run_id=args.run_id, lang=args.lang)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
