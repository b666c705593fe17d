"""Round-5f operators: CJK-aware text stats, corpus-frequency
boilerplate line removal, and the crawl snapshot delta."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics.corpusprep import (
    frequent_line_filter, split_token_lines)
from image_pdf_ocr_suite_spark.analytics.text import cjk_text_stats
from jobs.crawl_ingest_job import crawl_delta


# ---- cjk_text_stats -----------------------------------------------------

def test_cjk_stats_hand_checked(spark):
    s = "こんにちは世界。日本語のテストです！ Latin words here."
    df = spark.createDataFrame(
        [(0, s), (1, "plain ascii words"), (2, ""), (3, None)],
        "doc_id int, text string")
    rows = {r["doc_id"]: r for r in cjk_text_stats(df).collect()}
    r0 = rows[0]
    assert r0["n_chars"] == len(s)
    assert r0["n_han"] == 5            # 世界 日本語
    assert r0["n_kana"] == 11          # こんにちは のテストです
    assert r0["n_sentences"] == 3      # 。 ！ .
    # CJK chars count one token each; 。/！ become standalone segments
    # after CJK blanking, plus Latin/words/here.
    assert r0["n_tokens_cjk"] == 5 + 11 + 5
    # whitespace contract reads the whole Japanese run as ~one token
    assert r0["n_tokens_ws"] < r0["n_tokens_cjk"]
    r1 = rows[1]
    assert (r1["n_han"], r1["n_kana"], r1["n_sentences"]) == (0, 0, 0)
    assert r1["n_tokens_ws"] == r1["n_tokens_cjk"] == 3
    for i in (2, 3):                   # empty and NULL text
        assert rows[i]["n_chars"] == 0 and rows[i]["n_tokens_cjk"] == 0


def test_cjk_stats_halfwidth_kana(spark):
    df = spark.createDataFrame([(0, "ｱｲｳ half-width")],
                               "doc_id int, text string")
    r = cjk_text_stats(df).collect()[0]
    assert r["n_kana"] == 3
    assert r["n_tokens_cjk"] == 3 + 1


# ---- frequent_line_filter ------------------------------------------------

def test_frequent_line_filter_drops_all_occurrences(spark):
    rows = [(0, 0, "cookie banner text"), (0, 1, "unique alpha"),
            (1, 0, "cookie banner text"), (1, 1, "unique beta"),
            (2, 0, "cookie banner text"), (2, 1, "unique gamma"),
            (3, 0, "only here once")]
    lines = spark.createDataFrame(
        rows, "doc_id int, line_no int, line string")
    out = {r["doc_id"]: r
           for r in frequent_line_filter(lines, min_docs=2).collect()}
    for d in (0, 1, 2):                # boilerplate dropped EVERYWHERE
        assert out[d]["n_lines"] == 2 and out[d]["n_kept"] == 1
        assert "cookie" not in out[d]["kept_text"]
    assert out[3]["n_kept"] == 1
    assert out[3]["kept_text"] == "only here once"


def test_frequent_line_filter_host_scoped(spark):
    """scope_col narrows the frequency universe: a line repeated on TWO
    DIFFERENT hosts (once each) survives the scoped policy that the
    global policy kills; each host's own template still goes."""
    rows = [
        (0, 0, "nav of site a", "a"), (0, 1, "shared legal", "a"),
        (1, 0, "nav of site a", "a"), (1, 1, "body one", "a"),
        (2, 0, "nav of site b", "b"), (2, 1, "shared legal", "b"),
        (3, 0, "nav of site b", "b"), (3, 1, "body two", "b"),
    ]
    lines = spark.createDataFrame(
        rows, "doc_id int, line_no int, line string, host string")
    scoped = {r["doc_id"]: r for r in frequent_line_filter(
        lines, min_docs=2, scope_col="host").collect()}
    # per-host nav dropped everywhere; cross-host 'shared legal' kept
    assert scoped[0]["kept_text"] == "shared legal"
    assert scoped[2]["kept_text"] == "shared legal"
    assert scoped[1]["kept_text"] == "body one"
    # the GLOBAL policy kills 'shared legal' on the same input
    glob = {r["doc_id"]: r for r in frequent_line_filter(
        lines.drop("host"), min_docs=2).collect()}
    assert glob[0]["n_kept"] == 0 and glob[2]["n_kept"] == 0


def test_frequent_line_filter_all_boilerplate_doc(spark):
    lines = spark.createDataFrame(
        [(0, 0, "x"), (1, 0, "x"), (2, 0, "x")],
        "doc_id int, line_no int, line string")
    out = {r["doc_id"]: r
           for r in frequent_line_filter(lines, min_docs=2).collect()}
    assert all(out[d]["n_kept"] == 0 and out[d]["kept_text"] == ""
               for d in (0, 1, 2))


def test_frequent_line_filter_keeps_line_order(spark):
    lines = spark.createDataFrame(
        [(0, 2, "c c"), (0, 0, "a a"), (0, 1, "b b")],
        "doc_id int, line_no int, line string")
    out = frequent_line_filter(lines, min_docs=2).collect()[0]
    assert out["kept_text"] == "a a b b c c"


def test_frequent_line_filter_vs_line_dedup_policy(spark):
    """Same pseudo-line input as q_line_dedup: the frequency policy can
    only keep a subset of what first-occurrence keeping retains, and
    per-doc totals agree."""
    from image_pdf_ocr_suite_spark.analytics.corpusprep import (
        line_dedup_stats)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lines = split_token_lines(docs, tokens_per_line=8)
    freq = {r["doc_id"]: r for r in
            frequent_line_filter(lines, min_docs=2).collect()}
    dedup = {r["doc_id"]: r for r in line_dedup_stats(lines).collect()}
    assert set(freq) == set(dedup)
    dropped_somewhere = False
    for d in freq:
        assert freq[d]["n_lines"] == dedup[d]["n_lines"]
        assert freq[d]["n_kept"] <= dedup[d]["n_kept"]
        dropped_somewhere |= freq[d]["n_kept"] < freq[d]["n_lines"]
    assert dropped_somewhere        # the corpus does contain repeats


def test_frequent_line_filter_plan_broadcasts(spark):
    lines = spark.createDataFrame(
        [(0, 0, "x y"), (1, 0, "x y"), (1, 1, "z w")],
        "doc_id int, line_no int, line string")
    out = frequent_line_filter(lines, min_docs=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


# ---- crawl_delta ---------------------------------------------------------

@pytest.fixture()
def two_snapshots(spark):
    old = spark.createDataFrame(
        [("u1", b"same"), ("u2", b"before"), ("u3", b"kept")],
        "url string, html binary")
    new = spark.createDataFrame(
        [("u1", b"same"), ("u2", b"after"), ("u4", b"brand new")],
        "url string, html binary")
    return old, new


def test_crawl_delta_statuses(spark, two_snapshots):
    old, new = two_snapshots
    rows = {r["url"]: r for r in crawl_delta(old, new).collect()}
    assert rows["u1"]["status"] == "unchanged"
    assert rows["u2"]["status"] == "changed"
    assert rows["u3"]["status"] == "gone"
    assert rows["u4"]["status"] == "added"
    assert rows["u4"]["old_digest"] is None
    assert rows["u3"]["new_digest"] is None
    assert rows["u2"]["old_digest"] != rows["u2"]["new_digest"]


def test_crawl_delta_never_shuffles_bodies(spark, two_snapshots):
    """The join input is the (url, digest) projection — the binary
    column is pruned before the exchange."""
    old, new = two_snapshots
    plan = (crawl_delta(old, new)
            ._jdf.queryExecution().executedPlan().toString())
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "html" not in ln, plan


# ---- fix_mojibake ---------------------------------------------------------

def test_fix_mojibake_hand_cases(spark):
    from image_pdf_ocr_suite_spark.analytics.corpusprep import fix_mojibake

    base = "café £5 — 日本語"
    m1 = base.encode("utf-8").decode("cp1252")
    m2 = m1.encode("utf-8").decode("latin-1")
    rows = [(0, "plain ascii"), (1, m1), (2, m2), (3, base),
            (4, "naïve café"), (5, "日本語そのまま"), (6, None), (7, "")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in fix_mojibake(df).collect()}
    assert (out[0]["text"], out[0]["n_passes"]) == ("plain ascii", 0)
    assert (out[1]["text"], out[1]["n_passes"]) == (base, 1)
    assert (out[2]["text"], out[2]["n_passes"]) == (base, 2)
    # legitimate non-ASCII text is a fixed point: the clean form,
    # Latin-1 prose, and CJK all come back byte-identical
    for i in (3, 4, 5):
        assert out[i]["text"] == rows[i][1] and out[i]["n_passes"] == 0
    assert out[6]["text"] is None and out[6]["n_passes"] == 0
    assert out[7]["text"] == "" and out[7]["n_passes"] == 0
