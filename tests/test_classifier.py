"""Trained quality classifier (analytics/classifier.py).

Pins: distributed training == single-process replay BIT-exactly (the
integer-quantized gradient aggregation is the determinism device),
scoring == replay, the classifier actually separates distinct
vocabularies, label/threshold semantics, and the map-only scoring plan.
"""

from __future__ import annotations

import pytest

from image_pdf_ocr_suite_spark.analytics import classifier as clf

# positives (doc_id % 5 == 0) share a curated vocabulary, negatives a
# junk vocabulary with a little overlap — separable in a few epochs
DOCS = []
for i in range(40):
    if i % 5 == 0:
        DOCS.append((i, "curated quality prose with careful editing "
                        "and curated structure number %d" % i))
    else:
        DOCS.append((i, "click spam junk buy now winner prize "
                        "junk click number %d" % i))
DOCS += [(100, ""), (101, None), (106, "curated quality prose")]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def weights(spark, docs_df):
    return clf.train_classifier(docs_df, dim=256, epochs=5)


def test_training_matches_replay_bit_exactly(weights):
    w_replay = clf.replay_train(DOCS, dim=256, epochs=5)
    assert (weights == w_replay).all()  # bit-equal, not approx


def test_scores_match_replay(spark, docs_df, weights):
    got = {r["doc_id"]: (r["n_tokens"], r["score_q"], r["label"],
                         r["predicted"])
           for r in clf.score_documents(docs_df, weights,
                                        dim=256).collect()}
    assert got == clf.replay_scores(DOCS, weights, dim=256)


def test_separates_vocabularies(spark, docs_df, weights):
    rows = clf.score_documents(docs_df, weights, dim=256).collect()
    pos = [r["score_q"] for r in rows if r["label"] == 1 and r["n_tokens"]]
    neg = [r["score_q"] for r in rows
           if r["label"] == 0 and r["n_tokens"] and r["doc_id"] != 106]
    assert min(pos) > max(neg)  # distinct vocab → full separation
    # held-out positive-vocab doc (id 106 is NOT % 5 == 0) scores with
    # the curated side even though its label is 0
    d106 = next(r for r in rows if r["doc_id"] == 106)
    assert d106["label"] == 0 and d106["score_q"] > max(neg)


def test_label_and_threshold_semantics(spark, docs_df, weights):
    rows = clf.score_documents(docs_df, weights, dim=256).collect()
    for r in rows:
        assert r["label"] == (1 if r["doc_id"] % 5 == 0 else 0)
        assert r["predicted"] == (1 if r["score_q"] >= 500000 else 0)
    empty = {r["doc_id"]: r for r in rows if r["doc_id"] in (100, 101)}
    # empty/null text: bias-only vector, n_tokens 0, still scored
    assert empty[100]["n_tokens"] == 0 and empty[101]["n_tokens"] == 0
    assert empty[100]["score_q"] == empty[101]["score_q"]


def test_scoring_is_map_only(spark, docs_df, weights):
    plan = clf.score_documents(docs_df, weights, dim=256) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_partitioning_invariance(spark, docs_df, weights):
    w8 = clf.train_classifier(docs_df.repartition(8), dim=256, epochs=3)
    w1 = clf.train_classifier(docs_df.coalesce(1), dim=256, epochs=3)
    assert (w8 == w1).all()
