"""Tokenizer-training job — the subword-trainer trio as a CLI.

    documents table (id, text[, lang])
      -> word-frequency vocabulary        bpe.word_vocab (ONE corpus shuffle)
      -> chosen trainer                   --family bpe | unigram | wordpiece
      -> snapshot-committed vocab relation + encode-stats report

The three families share the vocabulary-relation scale shape (the token
stream is never re-scanned after word_vocab) and differ only in the
objective: BPE merges the most FREQUENT adjacent pair (Sennrich 2016),
WordPiece the highest LIKELIHOOD ratio pair (Schuster & Nakajima 2012),
unigram prunes a seeded vocabulary by Viterbi hard-EM (Kudo 2018).

Outputs under --output-root, snapshot-committed with the per-table
run_id replay guard (re-running a committed run_id is a no-op —
exactly-once across retries, the funnel/export job contract):

    vocab/   the trained vocabulary relation
             bpe:       (rank, left, right, pair_count)
             wordpiece: (rank, piece, left, right, pair_count,
                         left_count, right_count, score_q)
             unigram:   (rank, piece, piece_count, qlog)
    stats/   per-group encoded-stream size under the trained vocabulary

    spark-submit --py-files pkg.zip jobs/tokenizer_job.py \
        --input-table docs.parquet --output-root /out \
        --family wordpiece [--n-merges 8] [--text-col text] \
        [--group-col lang] [--run-id RID]
"""

from __future__ import annotations

import argparse
import sys
import uuid

from image_pdf_ocr_suite_spark.session import build_session
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable


def main(argv: list[str] | None = None, *,
         stop_session: bool = True) -> None:
    """``stop_session=False`` leaves the (possibly shared) SparkSession
    running — for in-process callers like the test suite."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-table", required=True)
    ap.add_argument("--output-root", required=True)
    ap.add_argument("--family", required=True,
                    choices=("bpe", "unigram", "wordpiece"))
    ap.add_argument("--n-merges", type=int, default=8,
                    help="merge rounds (bpe/wordpiece; unigram uses its "
                         "own bounded EM schedule)")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--group-col", default="lang",
                    help="grouping column of the encode-stats report")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args(argv)

    spark = build_session(app=f"tokenizer-job-{args.family}")
    run_id = args.run_id or uuid.uuid4().hex[:12]
    vocab_tbl = SnapshotTable(f"{args.output_root}/vocab")
    stats_tbl = SnapshotTable(f"{args.output_root}/stats")
    # per-table replay guard: re-running a committed run_id is a no-op
    # (exactly-once across retries, the funnel/export job contract) —
    # checked BEFORE training so a replay never pays the merge rounds
    done = [any(s.run_id == run_id for s in t.snapshots())
            for t in (vocab_tbl, stats_tbl)]
    if all(done):
        if stop_session:
            spark.stop()
        return
    docs = spark.read.parquet(args.input_table)

    if args.family == "bpe":
        from image_pdf_ocr_suite_spark.analytics import bpe as mod

        trained = mod.bpe_train(docs, n_merges=args.n_merges,
                                text_col=args.text_col)
        vocab = mod.merge_table(spark, trained)
        stats = mod.encode_token_stats(
            docs, [(le, r) for le, r, _c in trained],
            text_col=args.text_col, group_col=args.group_col)
    elif args.family == "wordpiece":
        from image_pdf_ocr_suite_spark.analytics import wordpiece as mod

        trained = mod.wordpiece_train(docs, n_merges=args.n_merges,
                                      text_col=args.text_col)
        vocab = mod.vocab_table(spark, trained)
        stats = mod.encode_token_stats(
            docs, trained, mod.corpus_alphabet(docs, args.text_col),
            text_col=args.text_col, group_col=args.group_col)
    else:
        from image_pdf_ocr_suite_spark.analytics import unigram as mod

        trained = mod.unigram_train(docs, text_col=args.text_col)
        vocab = mod.vocab_table(spark, trained)
        stats = mod.encode_token_stats(
            docs, trained, text_col=args.text_col,
            group_col=args.group_col)

    # a crash between the two appends must not skip the uncommitted
    # table on replay (the stream.py two-table convention)
    if not done[0]:
        vocab_tbl.append(vocab, run_id=run_id)
    if not done[1]:
        stats_tbl.append(stats, run_id=run_id)
    if stop_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
