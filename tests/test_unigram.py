"""Unigram-LM tokenizer training (analytics/unigram.py).

Pins: distributed hard-EM training == pure-Python replay exactly
(integer counts, shared _qlog/_viterbi, total tie-breaks), Viterbi
properties (coverage incl. out-of-alphabet chars, longest-last-piece
tie-break), encode stats equivalence, and the plan shapes (E-step
shuffles piece partials only; encoding is map-only + one short-key
aggregate).
"""

from __future__ import annotations

import pytest

from image_pdf_ocr_suite_spark.analytics import unigram
from image_pdf_ocr_suite_spark.analytics.bpe import replay_word_freq

TEXTS = [
    ("en", "low lower lowest low low"),
    ("en", "new newer newest new"),
    ("en", "wider wide wide new"),
    ("en", "hello hello help world word"),
    ("ja", "低い 低い 広い 低地"),
    ("en", None),
    ("en", ""),
]

PARAMS = dict(max_len=5, seed_multi=24, target_multi=10, rounds=3)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(TEXTS, "lang string, text string")


@pytest.fixture(scope="module")
def trained(spark, docs_df):
    # driver_max_vocab=0 forces the DISTRIBUTED EM — every property test
    # below exercises the distributed spelling (round 6)
    return unigram.unigram_train(docs_df, driver_max_vocab=0, **PARAMS)


def test_train_matches_replay(trained, spark, docs_df):
    expected = unigram.replay_train(
        replay_word_freq([t for _, t in TEXTS]), **PARAMS)
    assert trained == expected
    # the auto fast path (bounded vocab -> driver replay) must agree
    assert unigram.unigram_train(docs_df, **PARAMS) == expected


def test_vocab_shape_and_ranking(trained):
    # every single character of the corpus alphabet survives (coverage)
    alphabet = {ch for _, t in TEXTS if t for w in t.split(" ") for ch in w}
    pieces = {p for p, _c, _q in trained}
    assert alphabet <= pieces
    # multi pieces bounded by target_multi
    assert sum(1 for p in pieces if len(p) > 1) <= PARAMS["target_multi"]
    # ranked (count DESC, piece ASC); qlog strictly increasing with count
    counts = [(-c, p) for p, c, _q in trained]
    assert counts == sorted(counts)
    by_count = {c: q for _p, c, q in trained}
    cs = sorted(by_count)
    assert all(by_count[a] <= by_count[b] for a, b in zip(cs, cs[1:]))


def test_viterbi_properties(trained):
    scores = {p: q for p, _c, q in trained}
    # segmentation concatenates back to the word, for corpus words and
    # for words with characters outside the trained alphabet
    for w in ("lowest", "hello", "低い", "héllo", "zzz"):
        toks = unigram._viterbi(w, scores, PARAMS["max_len"])
        assert "".join(toks) == w
        assert all(toks)
    # longest-last-piece tie-break: with equal-score pieces the smaller
    # split point wins
    tie = {"a": -10, "b": -10, "ab": -20}
    assert unigram._viterbi("ab", tie, 5) == ["ab"]


def test_encode_stats_match_replay(spark, docs_df, trained):
    got = {r["lang"]: (r["n_docs"], r["n_tokens_unigram"])
           for r in unigram.encode_token_stats(docs_df, trained).collect()}
    exp = unigram.replay_encode_stats(list(TEXTS), trained)
    assert got == exp
    assert got["ja"][0] == 1
    # None/empty texts count as docs with zero tokens
    assert got["en"][0] == 6


def test_estep_plan_shuffles_pieces_only(spark, docs_df, trained):
    # the E-step aggregates (piece, c) partials: its shuffle schema
    # must carry piece/c only — never words or text
    from image_pdf_ocr_suite_spark.analytics.bpe import word_vocab

    vocab = word_vocab(docs_df)
    b = spark.sparkContext.broadcast(
        {p: q for p, _c, q in trained})
    agg = unigram._piece_partials(
        vocab, unigram._estep_kernel(b, PARAMS["max_len"]))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    ex_lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert any("hashpartitioning(piece" in ln for ln in ex_lines)
    # no exchange ever carries text: keys are piece/word only
    assert all("text" not in ln for ln in ex_lines)


def test_encode_plan_map_only(docs_df, trained):
    out = unigram.encode_token_stats(docs_df, trained)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one short-key aggregate; the only exchange is on the group key
    assert plan.count("Exchange") == 1


def test_empty_corpus_trains_empty_vocab(spark):
    empty = spark.createDataFrame(
        [("en", None), ("en", "")], "lang string, text string")
    trained = unigram.unigram_train(empty, **PARAMS)
    assert trained == unigram.replay_train({}, **PARAMS) == []
    # encode under an empty vocab: UNK single-char fallback still
    # tokenizes, docs with null/empty text count zero tokens
    docs = spark.createDataFrame(
        [("en", "ab c"), ("en", None)], "lang string, text string")
    got = {r["lang"]: (r["n_docs"], r["n_tokens_unigram"])
           for r in unigram.encode_token_stats(docs, trained).collect()}
    assert got == {"en": (2, 3)}
