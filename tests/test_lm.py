"""CCNet-style bigram-LM perplexity scoring (analytics/lm.py).

Pins: Spark scoring == pure-Python replay bit-exactly (counts AND the
quantized float scores), bucket semantics, short-doc handling, and the
map-only plan shape (no exchange in the scoring stage).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import lm

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "cats and dogs and cats"),
    (3, ""),
    (4, None),
    (5, "the cat sat on the mat again and again"),
    (6, "one"),
    (7, "zz yy xx ww vv uu"),
    (8, "the the the the"),
    (10, "the mat sat on the cat"),
    (15, "on the mat the cat sat"),
    (20, "dogs chase cats chase dogs"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_scores_match_replay_bit_exactly(spark, docs_df):
    model = lm.train_bigram_lm(docs_df)
    cutoffs = lm.train_bucket_cutoffs(docs_df, model)
    expected, exp_cutoffs = lm.replay_scores(DOCS)
    assert cutoffs == exp_cutoffs
    got = {r["doc_id"]: (r["n_bigrams"], r["logprob_q"])
           for r in lm.score_perplexity(docs_df, model, cutoffs).collect()}
    assert got == expected


def test_counts_are_reference_slice_only(spark, docs_df):
    model = lm.train_bigram_lm(docs_df, ref_mod=5)
    # slice = ids 0, 5, 10, 15, 20 — 'dog' appears only in doc 1 (off-slice)
    assert "dog" not in model.unigram
    assert model.unigram["the"] == 8  # 2 each over docs 0/5/10/15
    assert model.bigram[("the", "cat")] == 4  # docs 0, 5, 10, 15
    assert model.v == len(model.unigram) + 1


def test_bucket_semantics(spark, docs_df):
    model = lm.train_bigram_lm(docs_df)
    cutoffs = lm.train_bucket_cutoffs(docs_df, model)
    rows = {r["doc_id"]: r for r in
            lm.score_perplexity(docs_df, model, cutoffs).collect()}
    # zero-bigram docs are 'short' regardless of cutoffs
    for i in (3, 4, 6):
        assert rows[i]["bucket"] == "short"
        assert rows[i]["n_bigrams"] == 0 and rows[i]["logprob_q"] == 0
    c_head, c_mid = cutoffs
    for i, r in rows.items():
        if r["n_bigrams"] == 0:
            continue
        q = r["logprob_q"]
        want = ("head" if q >= c_head else
                "middle" if q >= c_mid else "tail")
        assert r["bucket"] == want, i
    # on-slice reference text scores better than OOV gibberish
    assert rows[0]["logprob_q"] > rows[7]["logprob_q"]


def test_tercile_cutoffs_integer_indexing():
    assert lm.tercile_cutoffs([]) == (0, 0)
    assert lm.tercile_cutoffs([5]) == (5, 5)
    # 6 values desc: ceil(6/3)=2nd and ceil(12/3)=4th
    assert lm.tercile_cutoffs([1, 2, 3, 4, 5, 6]) == (5, 3)
    # 7 values desc: ceil(7/3)=3rd and ceil(14/3)=5th
    assert lm.tercile_cutoffs(list(range(1, 8))) == (5, 3)


def test_scoring_is_map_only(spark, docs_df):
    model = lm.train_bigram_lm(docs_df)
    plan = lm.score_perplexity(docs_df, model, (0, -1)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
