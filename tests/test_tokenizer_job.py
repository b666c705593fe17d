"""Tokenizer-training job (jobs/tokenizer_job.py): each family's CLI
run commits a vocab relation that equals the library replay, plus the
encode-stats report; a re-run with the same run_id is a no-op (the
SnapshotTable replay guard — exactly-once across retries)."""

from __future__ import annotations

import pytest

from image_pdf_ocr_suite_spark.analytics import bpe, unigram
from image_pdf_ocr_suite_spark.analytics import wordpiece as wp
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable
from jobs.tokenizer_job import main as tok_main

TEXTS = [
    ("en", "low lower lowest low low"),
    ("en", "new newer newest new"),
    ("ja", "低い 低い 広い"),
    ("en", None),
]


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("tok") / "docs")
    spark.createDataFrame(TEXTS, "lang string, text string") \
         .write.parquet(p)
    return p


def _wf():
    return bpe.replay_word_freq([t for _g, t in TEXTS])


def test_wordpiece_job_commits_replay_vocab(spark, tmp_path, docs_path):
    out = str(tmp_path / "out")
    tok_main(["--input-table", docs_path, "--output-root", out,
              "--family", "wordpiece", "--run-id", "t-wp"],
             stop_session=False)
    vocab = SnapshotTable(f"{out}/vocab").read(spark).orderBy("rank")
    got = [(r["left"], r["right"], r["pair_count"],
            r["left_count"], r["right_count"]) for r in vocab.collect()]
    assert got == wp.replay_train(_wf(), 8)
    stats = {r["lang"]: (r["n_docs"], r["n_words"], r["n_pieces"],
                         r["n_unk_words"])
             for r in SnapshotTable(f"{out}/stats").read(spark).collect()}
    want = wp.replay_encode_stats(
        TEXTS, wp.replay_train(_wf(), 8),
        wp.replay_alphabet([t for _g, t in TEXTS]))
    assert stats == want
    # replay guard: same run_id re-run is a no-op
    n_before = SnapshotTable(f"{out}/vocab").read(spark).count()
    tok_main(["--input-table", docs_path, "--output-root", out,
              "--family", "wordpiece", "--run-id", "t-wp"],
             stop_session=False)
    assert SnapshotTable(f"{out}/vocab").read(spark).count() == n_before


def test_bpe_job_commits_replay_vocab(spark, tmp_path, docs_path):
    out = str(tmp_path / "out")
    tok_main(["--input-table", docs_path, "--output-root", out,
              "--family", "bpe", "--n-merges", "4", "--run-id", "t-bpe"],
             stop_session=False)
    vocab = SnapshotTable(f"{out}/vocab").read(spark).orderBy("rank")
    got = [(r["left"], r["right"], r["pair_count"])
           for r in vocab.collect()]
    assert got == bpe.replay_merges(_wf(), 4)
    assert SnapshotTable(f"{out}/stats").read(spark).count() == 2  # en, ja


def test_unigram_job_commits_replay_vocab(spark, tmp_path, docs_path):
    out = str(tmp_path / "out")
    tok_main(["--input-table", docs_path, "--output-root", out,
              "--family", "unigram", "--run-id", "t-ug"],
             stop_session=False)
    vocab = SnapshotTable(f"{out}/vocab").read(spark).orderBy("rank")
    got = [(r["piece"], r["piece_count"], r["qlog"])
           for r in vocab.collect()]
    assert got == unigram.replay_train(_wf())
    assert SnapshotTable(f"{out}/stats").read(spark).count() == 2
