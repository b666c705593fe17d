"""Sentence segmentation with char spans (analytics/sentences.py)."""
import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from image_pdf_ocr_suite_spark.analytics import sentences as S


def test_split_basic():
    t = "Hello world. This is  a test! trailing bit"
    rows = S.split_sentences(t)
    assert rows == [(0, 0, 12, 2), (1, 13, 29, 4), (2, 30, 42, 2)]
    for _, s, e, _ in rows:
        assert t[s:e] == t[s:e].strip(" ")   # spans never include edges


def test_split_edges():
    assert S.split_sentences("") == []
    assert S.split_sentences("   ") == []
    assert S.split_sentences("One.") == [(0, 0, 4, 1)]
    # no terminal at all -> one sentence covering everything
    assert S.split_sentences("no stop here") == [(0, 0, 12, 3)]
    # terminal chars INSIDE a token do not split; only token-final do
    assert S.split_sentences("A.B. next.") == [(0, 0, 4, 1), (1, 5, 10, 1)]
    # trailing spaces after the last terminal: no phantom sentence
    assert S.split_sentences("Done.  ") == [(0, 0, 5, 1)]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=" abc.!?", max_size=60))
def test_split_invariants(t):
    rows = S.split_sentences(t)
    prev_end = -1
    for k, (idx, s, e, n) in enumerate(rows):
        assert idx == k                       # dense 0-based
        assert 0 <= s < e <= len(t)
        assert s > prev_end                   # ordered, non-overlapping
        prev_end = e
        frag = t[s:e]
        assert frag and frag[0] != " " and frag[-1] != " "
        assert n == len([x for x in frag.split(" ") if x])
    # every non-space char lands in exactly one sentence span
    assert "".join(sorted(t.replace(" ", ""))) == "".join(
        sorted("".join(t[s:e] for _, s, e, _ in rows).replace(" ", "")))


def test_spark_spans_and_stats(spark):
    rows = [(1, "Alpha beta. Gamma!"), (2, ""), (3, None),
            (4, "x y z"), (5, "One. Two. Three three.")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = S.sentence_spans(df).orderBy("doc_id", "sent_idx").collect()
    assert [(r.doc_id, r.sent_idx, r.sentence) for r in out] == [
        (1, 0, "Alpha beta."), (1, 1, "Gamma!"),
        (4, 0, "x y z"),
        (5, 0, "One."), (5, 1, "Two."), (5, 2, "Three three.")]
    texts = dict(rows)
    for r in out:
        assert texts[r.doc_id][r.start:r.end] == r.sentence
    stats = {r.doc_id: (r.n_sentences, r.mean_tokens_bp, r.max_tokens)
             for r in S.sentence_stats(S.sentence_spans(df)).collect()}
    assert stats[1] == (2, 15000, 2)
    assert stats[5] == (3, 13333, 2)


def test_offsets_only_form_matches(spark):
    """include_text=False (the scale form) = the same rows minus the
    sentence column; offsets still cut the exact substrings."""
    rows = [(1, "Alpha beta. Gamma!"), (2, "x y. z")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    full = S.sentence_spans(df).collect()
    meta = S.sentence_spans(df, include_text=False)
    assert meta.columns == ["doc_id", "sent_idx", "start", "end",
                            "n_tokens"]
    got = sorted((r.doc_id, r.sent_idx, r.start, r.end, r.n_tokens)
                 for r in meta.collect())
    want = sorted((r.doc_id, r.sent_idx, r.start, r.end, r.n_tokens)
                  for r in full)
    assert got == want
    texts = dict(rows)
    assert sorted(texts[r.doc_id][r.start:r.end] for r in meta.collect()) \
        == sorted(r.sentence for r in full)


def test_duckdb_replay_matches(spark):
    """The SQL restatement (the oracle's core) matches the kernel on
    messy text — double spaces, unterminated tails, token-final mixes."""
    rows = [(i, t) for i, t in enumerate([
        "Plain words only", "End. ", "a  b.  c!x y? tail",
        "multi   space.  here", ". .. ...", "! lead", "mid. dle. end"])]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted((r.doc_id, r.sent_idx, r.start, r.end, r.n_tokens,
                  r.sentence) for r in S.sentence_spans(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, '{t}')" for i, t in rows)
                + ") t(doc_id, text)")
    want = sorted(tuple(r) for r in con.execute(ORACLE_CORE).fetchall())
    assert got == want


ORACLE_CORE = """
WITH tok AS (
    SELECT doc_id, text, string_split(text, ' ') AS tk
    FROM documents WHERE text IS NOT NULL AND text != ''),
ex AS (
    SELECT doc_id, text,
           unnest(tk) AS t,
           unnest(range(1, len(tk) + 1)) AS i
    FROM tok),
pos AS (
    SELECT doc_id, text, t, i,
           CAST(coalesce(sum(len(t) + 1) OVER (
               PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS tok_start,
           CASE WHEN len(t) > 0 AND right(t, 1) IN ('.', '!', '?')
                THEN 1 ELSE 0 END AS term
    FROM ex),
sid AS (
    SELECT *, CAST(coalesce(sum(term) OVER (
               PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS sent_idx
    FROM pos)
SELECT doc_id, sent_idx,
       min(tok_start) AS "start",
       max(tok_start + len(t)) AS "end",
       CAST(count(*) AS BIGINT) AS n_tokens,
       substring(any_value(text),
                 CAST(min(tok_start) AS INTEGER) + 1,
                 CAST(max(tok_start + len(t)) - min(tok_start) AS INTEGER))
           AS sentence
FROM sid WHERE len(t) > 0
GROUP BY doc_id, sent_idx
"""
