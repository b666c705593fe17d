"""spark-submit entry point (north_rule packaging).

    zip -r pkg.zip image_pdf_ocr_suite_spark/
    spark-submit --py-files pkg.zip jobs/extract_job.py \
        --input-table /path/to/pages_parquet \
        --output-root /path/to/output \
        --mode text|spans|pdf [--resume] [--run-id RID]

Reads the Common-Crawl-style pages table, runs the extraction pipeline,
and appends to snapshot-committed output tables (text + spans + quarantine
+ metrics).  ``--resume`` anti-joins the committed urls of a previous run
(idempotent restart after executor/driver loss — north_rule).

On a cluster with an Iceberg catalog, replace SnapshotTable with
``df.writeTo(table).append()`` — the pipeline code is unchanged.
"""

from __future__ import annotations

import argparse
import sys
import uuid

from image_pdf_ocr_suite_spark import ExtractConfig, extract_pages
from image_pdf_ocr_suite_spark.session import build_session
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable


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
    run_id = args.run_id or uuid.uuid4().hex[:12]
    cfg = ExtractConfig(lang=args.lang)

    pages = spark.read.parquet(args.input_table)
    text_table = SnapshotTable(f"{args.output_root}/text")
    quar_table = SnapshotTable(f"{args.output_root}/quarantine")
    if args.resume:
        # done = extracted urls ∪ quarantined urls: quarantined payloads are
        # settled (retrying a corrupt payload forever is the wrong default;
        # re-run without --resume to retry them deliberately)
        pages = text_table.remaining_input(pages, "url")
        pages = quar_table.remaining_input(pages, "url")

    def _append(table: SnapshotTable, df) -> None:
        if not df.isEmpty():
            table.append(df, run_id=run_id)

    res = extract_pages(pages, cfg, run_id=run_id)
    if args.mode in ("text", "all"):
        _append(text_table, res.text)
    if args.mode in ("spans", "all"):
        _append(SnapshotTable(f"{args.output_root}/spans"), res.spans)
    if args.mode == "pdf":
        from image_pdf_ocr_suite_spark.kernels.pdfsink import emit_searchable_pdfs
        _append(SnapshotTable(f"{args.output_root}/pdf"),
                emit_searchable_pdfs(pages, cfg))
    _append(quar_table, res.quarantine)
    _append(SnapshotTable(f"{args.output_root}/metrics"), res.metrics)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
