"""End-to-end corpus pipeline job — crawl archives to training shards
as ONE resumable CLI, every stage a tested engine operator:

    WARC archives table (warc binary)          [or --pages-table]
      -> S1 ingest    crawl_ingest_job.ingest_pages
                        -> {root}/pages + {root}/ingest_rejects
      -> S2 clean     corpus_job.clean_corpus (extraction, quality
                      floor, lang allowlist, exact + verified near-dup
                      removal, optional decontamination)
                        -> {root}/clean + {root}/clean_rejects
      -> S3 mix       mixing.temperature_sample grouped by canonical
                      url host (sqrt-temperature source balance)
                        -> {root}/mixture_report   (audit rows only)
      -> S4 shards    export_job.pack_windows + shard_manifest
                        -> {root}/shards + {root}/manifest

Stage-level resume (the production property: a 100-TB run that dies in
S4 must not re-OCR the crawl): every stage commits to its own
SnapshotTable under the per-table replay guard — a stage whose table
already holds a snapshot with this ``--run-id`` is SKIPPED, and each
downstream stage reads its input from the COMMITTED upstream table,
never from an in-memory frame.  Re-running a fully-committed run id is
a no-op; a run killed between stages continues from the first
uncommitted one.  Use one ``--output-root`` per pipeline run (the
snapshot tables union every committed snapshot by design — see
tableio/snapshot.py).

The sampled mixture corpus is deliberately NOT materialized: the
md5-bucket sampling contract (analytics/mixing.py) is deterministic
and append-stable, so the sample is an exact VIEW over the committed
clean table — S4 recomputes it for free instead of duplicating a
corpus-sized write.  Only the ≤sources-row mixture report is committed
as the audit artifact.

    spark-submit --py-files pkg.zip jobs/pipeline_job.py \
        --archives-table warc.parquet --output-root /out \
        [--pages-table pages.parquet] [--budget-bp 2500] \
        [--min-tokens 10] [--langs en,ja] [--jaccard 0.5] \
        [--test-table held_out.parquet] [--capacity 256] \
        [--n-shards 32] [--chunk-tokens 50] [--overlap 10] \
        [--run-id r1]

Reference anchor: composes the reference CLI's extract-everything loop
(/root/reference/image_pdf_ocr/ocr.py:700-800) with the corpus-prep
stages a training-data pipeline runs downstream of it.
"""

from __future__ import annotations

import argparse
import sys
import uuid

from pyspark.sql import DataFrame, functions as F

from image_pdf_ocr_suite_spark.analytics import mixing
from image_pdf_ocr_suite_spark.analytics.corpusprep import _HOST_RE
from image_pdf_ocr_suite_spark.session import build_session
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable
from jobs.corpus_job import clean_corpus
from jobs.crawl_ingest_job import ingest_pages
from jobs.export_job import pack_windows, shard_manifest


def source_host_expr(url_col: str = "url"):
    """Canonical host as the mixture source — the canonicalize_urls
    host spelling (lowered, leading www. stripped); rows whose url has
    no scheme://host fall into the '' source bucket rather than being
    dropped (the mixture must account for every clean document)."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1)),
        "^www\\.", "")


def _committed(tbl: SnapshotTable, run_id: str) -> bool:
    return any(s.run_id == run_id for s in tbl.snapshots())


def main(argv: list[str] | None = None, *,
         stop_session: bool = True) -> None:
    """``stop_session=False`` leaves the (possibly shared) SparkSession
    running — for in-process callers like the test suite."""
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--archives-table",
                     help="parquet with a 'warc' binary column of "
                          "WARC/1.0 archives (S1 input)")
    src.add_argument("--pages-table",
                     help="pre-ingested north-rule pages parquet — "
                          "skips S1 (no pages table is committed; S2 "
                          "reads this path directly)")
    ap.add_argument("--output-root", required=True)
    ap.add_argument("--budget-bp", type=int, default=2500,
                    help="mixture budget in basis points of the clean "
                         "corpus (2500 = keep ~25%%, sqrt-temperature "
                         "balanced across hosts)")
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--langs", default="en,ja")
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--test-table", default=None,
                    help="held-out eval parquet (url, text); clean docs "
                         "sharing any 13-gram are rejected in S2")
    ap.add_argument("--capacity", type=int, default=256)
    ap.add_argument("--n-shards", type=int, default=32)
    ap.add_argument("--chunk-tokens", type=int, default=50)
    ap.add_argument("--overlap", type=int, default=10)
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args(argv)

    spark = build_session(app="pipeline-job")
    run_id = args.run_id or uuid.uuid4().hex[:12]
    root = args.output_root.rstrip("/")
    langs = tuple(args.langs.split(","))

    # ---- S1: ingest ------------------------------------------------
    if args.pages_table:
        pages = spark.read.parquet(args.pages_table)
    else:
        tbl_pages = SnapshotTable(f"{root}/pages")
        if not _committed(tbl_pages, run_id):
            p, rej = ingest_pages(
                spark.read.parquet(args.archives_table))
            # rejects first: a crash between the two appends replays
            # into a guard miss on pages only, and re-ingesting is
            # deterministic — but the PAGES commit is what downstream
            # stages key on, so it must be the last thing S1 does
            irej_tbl = SnapshotTable(f"{root}/ingest_rejects")
            if not _committed(irej_tbl, run_id):
                irej_tbl.append(rej, run_id=run_id)
            tbl_pages.append(p, run_id=run_id)
        pages = tbl_pages.read(spark)

    # ---- S2: clean -------------------------------------------------
    tbl_clean = SnapshotTable(f"{root}/clean")
    if not _committed(tbl_clean, run_id):
        test_df = (spark.read.parquet(args.test_table)
                   if args.test_table else None)
        clean, rejects = clean_corpus(
            pages, min_tokens=args.min_tokens, langs=langs,
            jaccard=args.jaccard, decontam_test=test_df,
            run_id=run_id)
        crej_tbl = SnapshotTable(f"{root}/clean_rejects")
        if not _committed(crej_tbl, run_id):
            crej_tbl.append(rejects, run_id=run_id)
        tbl_clean.append(clean, run_id=run_id)
    clean = tbl_clean.read(spark)

    # ---- S3: mixture plan + deterministic sample --------------------
    sourced = clean.withColumn("source", source_host_expr("url"))
    tbl_mix = SnapshotTable(f"{root}/mixture_report")
    if not _committed(tbl_mix, run_id):
        tbl_mix.append(
            mixing.mixture_report(sourced, args.budget_bp,
                                  source_col="source", id_col="url"),
            run_id=run_id)
    sample = mixing.temperature_sample(
        sourced, args.budget_bp, source_col="source", id_col="url")

    # ---- S4: shards ------------------------------------------------
    windows = pack_windows(
        sample, capacity=args.capacity, n_shards=args.n_shards,
        chunk_tokens=args.chunk_tokens, overlap=args.overlap,
        id_col="url", text_col="text")
    shards_tbl = SnapshotTable(f"{root}/shards")
    man_tbl = SnapshotTable(f"{root}/manifest")
    if not _committed(shards_tbl, run_id):
        # shards carry the data; the manifest is derived audit rows —
        # commit the manifest last so a reader that sees a manifest
        # row can rely on its shard rows existing
        shards_tbl.append(windows, run_id=run_id)
    if not _committed(man_tbl, run_id):
        man_tbl.append(shard_manifest(shards_tbl.read(spark)),
                       run_id=run_id)

    if stop_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
