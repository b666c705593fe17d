"""Index-lifecycle job — build / append / query the two materialized
retrieval indexes as a CLI.

    documents table (id, text)
      -> --family lexical: inverted-index layout (lexindex) + a BM25
         report for --query-terms against the index
      -> --family minhash: band-partitioned signature layout (dedup)
         + a candidate-pair report probing the batch against itself

Modes:
    --mode build    write the layout at --index-path (overwrite)
    --mode append   append the batch to the existing layout (caller
                    contract: batch ids disjoint from indexed ids)
    --mode stream   continuous ingest of --input-table's directory as
                    a file stream, exactly-once (lexical: lex_stream;
                    minhash: online_dedup — admission, not just
                    indexing), then compact to --index-path

The query report is snapshot-committed under --output-root with the
per-table run_id replay guard (re-running a committed run_id is a
no-op — the funnel/export/tokenizer job contract).

    spark-submit --py-files pkg.zip jobs/index_job.py \
        --input-table docs.parquet --index-path /idx --output-root /out \
        --family lexical --mode build \
        [--query-terms hash,join] [--n-buckets 64] [--run-id RID]
"""

from __future__ import annotations

import argparse
import sys
import uuid

from image_pdf_ocr_suite_spark.session import build_session
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable


def _mutation_done(index_path: str, run_id: str) -> bool:
    """Layout-mutation replay guard: the parquet layouts have no
    snapshot run_id of their own, so a crash between the append and
    the report commit would otherwise double-append the batch on retry
    (duplicated postings double every BM25 score silently).  A marker
    file per run_id inside the layout makes build/append idempotent."""
    import os
    return os.path.exists(os.path.join(index_path, f"_run_{run_id}"))


def _mark_mutation(index_path: str, run_id: str) -> None:
    import os
    with open(os.path.join(index_path, f"_run_{run_id}"), "w") as fh:
        fh.write("done\n")


def main(argv: list[str] | None = None, *,
         stop_session: bool = True) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-table", required=True)
    ap.add_argument("--index-path", required=True)
    ap.add_argument("--output-root", required=True)
    ap.add_argument("--family", required=True,
                    choices=("lexical", "minhash"))
    ap.add_argument("--mode", default="build",
                    choices=("build", "append", "stream"))
    ap.add_argument("--query-terms", default="hash,join,filter,zebra")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="stream mode: checkpoint location (default "
                         "<output-root>/_ckpt)")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args(argv)

    spark = build_session(app=f"index-job-{args.family}-{args.mode}")
    run_id = args.run_id or uuid.uuid4().hex[:12]
    report_tbl = SnapshotTable(f"{args.output_root}/report")
    if any(s.run_id == run_id for s in report_tbl.snapshots()):
        if stop_session:
            spark.stop()
        return

    if args.family == "lexical":
        from image_pdf_ocr_suite_spark.analytics import lexindex
        terms = [t for t in args.query_terms.split(",") if t]
        if args.mode == "stream":
            from image_pdf_ocr_suite_spark.streaming import lex_stream
            stream_root = f"{args.output_root}/stream"
            q = lex_stream.start_lex_index_stream(
                spark, args.input_table, f"{args.id_col} bigint, "
                f"{args.text_col} string", stream_root,
                args.checkpoint_dir or f"{args.output_root}/_ckpt",
                id_col=args.id_col, text_col=args.text_col,
                n_buckets=args.n_buckets)
            q.awaitTermination()
            lex_stream.compact_to_serving(spark, stream_root,
                                          args.index_path)
        else:
            docs = spark.read.parquet(args.input_table)
            if not _mutation_done(args.index_path, run_id):
                if args.mode == "build":
                    lexindex.write_inverted_index(
                        docs, args.index_path, id_col=args.id_col,
                        text_col=args.text_col, n_buckets=args.n_buckets)
                else:
                    lexindex.append_to_inverted_index(
                        docs, args.index_path, id_col=args.id_col,
                        text_col=args.text_col)
                _mark_mutation(args.index_path, run_id)
        report = lexindex.bm25_from_index(spark, args.index_path, terms)
    else:
        from image_pdf_ocr_suite_spark.analytics import dedup
        if args.mode == "stream":
            from image_pdf_ocr_suite_spark.streaming import online_dedup
            stream_root = f"{args.output_root}/stream"
            q = online_dedup.start_online_dedup_stream(
                spark, args.input_table, f"{args.id_col} bigint, "
                f"{args.text_col} string", stream_root,
                args.checkpoint_dir or f"{args.output_root}/_ckpt",
                id_col=args.id_col, text_col=args.text_col,
                threshold=args.threshold)
            q.awaitTermination()
            online_dedup.compact_to_index(spark, stream_root,
                                          args.index_path)
            report = online_dedup.admitted_corpus(spark, stream_root) \
                .select(args.id_col)
        else:
            docs = spark.read.parquet(args.input_table)
            if not _mutation_done(args.index_path, run_id):
                if args.mode == "build":
                    dedup.minhash_write_index(docs, args.index_path,
                                              text_col=args.text_col,
                                              id_col=args.id_col)
                else:
                    dedup.minhash_append_to_index(docs, args.index_path,
                                                  text_col=args.text_col,
                                                  id_col=args.id_col)
                _mark_mutation(args.index_path, run_id)
            report = dedup.dedup_against_index(
                docs, spark, args.index_path, text_col=args.text_col,
                id_col=args.id_col)

    report_tbl.append(report, run_id=run_id)
    if stop_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
