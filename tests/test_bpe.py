"""BPE merge training (analytics/bpe.py).

Pins: distributed training == pure-Python replay exactly (integer
counts, total tie-break), the paper's segmentation (end-of-word marker,
greedy rank-order application), encode stats, and the plan shapes (the
per-round winner is a TakeOrdered, not a full sort; encoding is
map-only + one short-key aggregate).
"""

from __future__ import annotations

import pytest

from image_pdf_ocr_suite_spark.analytics import bpe

TEXTS = [
    ("en", "low lower lowest low low"),
    ("en", "new newer newest new"),
    ("en", "wider wide wide new"),
    ("ja", "低い 低い 広い"),
    ("en", None),
    ("en", ""),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(TEXTS, "lang string, text string")


def test_train_matches_replay(spark, docs_df):
    # driver_max_vocab=0 forces the DISTRIBUTED rounds (round 6: the
    # counted fast path would otherwise make this replay-vs-replay)
    trained = bpe.bpe_train(docs_df, n_merges=8, driver_max_vocab=0)
    expected = bpe.replay_merges(
        bpe.replay_word_freq([t for _, t in TEXTS]), n_merges=8)
    assert trained == expected
    # the auto fast path (bounded vocab -> driver replay) must agree
    assert bpe.bpe_train(docs_df, n_merges=8) == expected
    assert len(trained) == 8
    # counts are non-increasing only per re-count — but every count >= 1
    assert all(c >= 1 for _, _, c in trained)


def test_first_merges_hand_checked(spark, docs_df):
    # 'low' x4, 'lower', 'lowest' => ('l','o') freq 6; ('o','w') freq 6;
    # 'new' x3, 'newer', 'newest' => ('n','e') 5... wait 'newest','newer',
    # 'new' x3 = 5, plus nothing else starts 'ne'.  ('w', EOW): low x4 +
    # new x3 = 7 — the top pair; tie-break handles the rest.
    wf = bpe.replay_word_freq([t for _, t in TEXTS])
    counts: dict[tuple[str, str], int] = {}
    for w, f in wf.items():
        sym = list(w) + [bpe.EOW]
        for p in zip(sym, sym[1:]):
            counts[p] = counts.get(p, 0) + f
    best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    trained = bpe.bpe_train(docs_df, n_merges=1)
    assert trained[0][:2] == best[0]
    assert trained[0][2] == best[1]


def test_apply_merges_greedy_rank_order():
    # rank order matters: ('a','b') then ('ab','c') builds 'abc'
    assert bpe._apply_merges("abc", [("a", "b"), ("ab", "c")]) \
        == ["abc", bpe.EOW]
    # left-to-right greediness: 'aaa' + ('a','a') -> ['aa', 'a', EOW]
    assert bpe._apply_merges("aaa", [("a", "a")]) == ["aa", "a", bpe.EOW]
    # EOW participates as a symbol
    assert bpe._apply_merges("no", [("o", bpe.EOW)]) == ["n", "o" + bpe.EOW]


def test_encode_stats_match_replay(spark, docs_df):
    trained = bpe.bpe_train(docs_df, n_merges=4)
    merges = [(left, right) for left, right, _ in trained]
    got = {r["lang"]: (r["n_docs"], r["n_tokens_bpe"])
           for r in bpe.encode_token_stats(docs_df, merges).collect()}
    assert got == bpe.replay_encode_stats(TEXTS, merges)
    # more merges never increase the encoded length
    got1 = {r["lang"]: r["n_tokens_bpe"]
            for r in bpe.encode_token_stats(docs_df, merges[:1]).collect()}
    for g, (_, n4) in got.items():
        assert n4 <= got1[g]


def test_plan_shapes(spark, docs_df):
    vocab = bpe.word_vocab(docs_df)
    top = bpe._pair_counts_df(vocab, []) \
        .orderBy("pair_count", ascending=False).limit(1)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # winner is not a full sort
    enc = bpe.encode_token_stats(docs_df, [("l", "o")])
    eplan = enc._jdf.queryExecution().executedPlan().toString()
    # one exchange only: the short-key group aggregate
    assert eplan.count("Exchange") == 1
