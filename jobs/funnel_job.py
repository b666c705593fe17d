"""Funnel admission job — the corpus-admission pipeline as a CLI.

    documents table (id, url, text)
      -> URL gate                    corpusprep.url_quality_filter
      -> language ID                 text.lang_id
      -> Gopher quality rules        text.gopher_quality
      -> compression-ratio bounds    corpusprep.compression_ratio
      -> test-set decontamination    corpusprep.decontaminate_ngrams
      -> snapshot-committed admitted ids + the 5-row attrition report

Batch mode runs one pass and commits once; ``--stream`` tails the input
directory with the streaming twin (streaming/funnel_stream.py):
micro-batch commits under the per-table replay guard (exactly-once
across restarts), per-batch attrition rows whose per-stage sums equal
the one-shot batch report.

    spark-submit --py-files pkg.zip jobs/funnel_job.py \
        --input-table docs.parquet --output-root /out \
        [--langs en] [--min-ratio-bp 4300] [--max-ratio-bp 9000] \
        [--test-table held_out.parquet] [--ngram-n 5] \
        [--stream --checkpoint /ckpt --input-schema "..."]
"""

from __future__ import annotations

import argparse
import sys
import uuid

from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import funnel
from image_pdf_ocr_suite_spark.session import build_session
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable


def main(argv: list[str] | None = None, *,
         stop_session: bool = True) -> None:
    """``stop_session=False`` leaves the (possibly shared) SparkSession
    running — for in-process callers like the test suite."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-table", required=True)
    ap.add_argument("--output-root", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--langs", default="en")
    ap.add_argument("--min-ratio-bp", type=int, default=4300)
    ap.add_argument("--max-ratio-bp", type=int, default=9000)
    ap.add_argument("--test-table", default=None,
                    help="parquet of the held-out eval set; admitted docs "
                         "sharing any word n-gram with it are rejected")
    ap.add_argument("--ngram-n", type=int, default=5)
    ap.add_argument("--impl", choices=("ops", "fused"), default="ops",
                    help="'fused' = single-kernel gate fusion (one scan, "
                         "zero shuffle; funnel.py _fused_verdicts, "
                         "row-identical); 'ops' = the audited "
                         "five-operator composition (batch mode only)")
    ap.add_argument("--stream", action="store_true",
                    help="tail --input-table as a directory with the "
                         "streaming twin (requires --checkpoint and "
                         "--input-schema)")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--input-schema", default=None,
                    help="DDL schema of the streamed input files")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args(argv)

    spark = build_session(app="funnel-job")
    langs = tuple(args.langs.split(","))
    test_df = (spark.read.parquet(args.test_table)
               if args.test_table else None)

    if args.stream:
        if not (args.checkpoint and args.input_schema):
            ap.error("--stream requires --checkpoint and --input-schema")
        if args.impl != "ops":
            # the streaming twin hashes the static side once via
            # test_grams — it has no fused path; fail loudly instead of
            # silently running ops under a fused flag
            ap.error("--impl fused is batch-only; --stream always runs "
                     "the operator composition")
        from image_pdf_ocr_suite_spark.streaming.funnel_stream import (
            start_funnel_stream)
        q = start_funnel_stream(
            spark, args.input_table, args.input_schema, args.output_root,
            args.checkpoint, test_docs=test_df, url_col=args.url_col,
            text_col=args.text_col, id_col=args.id_col, langs=langs,
            min_ratio_bp=args.min_ratio_bp, max_ratio_bp=args.max_ratio_bp,
            ngram_n=args.ngram_n)
        q.awaitTermination()
        if stop_session:
            spark.stop()
        return

    run_id = args.run_id or uuid.uuid4().hex[:12]
    # verdicts feed BOTH commits (admitted ids + attrition report) —
    # materialize the tiny (id, int) relation once so the gate lineage
    # (five scans for ops, one kernel pass for fused) runs once, not
    # twice.  localCheckpoint, not persist: checkpoint blocks are
    # ContextCleaner-reclaimed on GC, so repeated in-process callers
    # (stop_session=False) can't accumulate CacheManager entries
    # (round-5p CLAUDE.md rule).
    verdicts = funnel.funnel_verdicts(
        spark.read.parquet(args.input_table), test_df,
        url_col=args.url_col, text_col=args.text_col, id_col=args.id_col,
        langs=langs, min_ratio_bp=args.min_ratio_bp,
        max_ratio_bp=args.max_ratio_bp, ngram_n=args.ngram_n,
        impl=args.impl).localCheckpoint(eager=False)
    SnapshotTable(f"{args.output_root}/admitted").append(
        verdicts.where(F.col("rej_at").isNull()).select("id"),
        run_id=run_id)
    SnapshotTable(f"{args.output_root}/attrition").append(
        funnel.funnel_report(verdicts, spark), run_id=run_id)
    if stop_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
