"""Flagship test: the Spark pipeline's extracted text is byte-identical to
the single-process reference model for every url, at several partition
counts (determinism under parallelism), plus the span-offset invariant."""

import pandas as pd
import pytest

from image_pdf_ocr_suite_spark import fixtures, refmodel
from image_pdf_ocr_suite_spark.config import ExtractConfig
from image_pdf_ocr_suite_spark.pipeline import extract_pages

CFG = ExtractConfig()

# doc_ids 0..57 cover every payload mode incl. empty(5,34), encrypted(11,40),
# corrupt(17,46), html(23,52) (doc_id % 29 dispatch in fixtures.py)
DOC_ROWS = [(i, f"tok{i} " * 3 + " ".join(f"word{i}_{j}" for j in range(24)), "ja")
            for i in range(58)]


@pytest.fixture(scope="module")
def corpus():
    return fixtures.build_pages_pdf(DOC_ROWS)


def _expected_texts(corpus: pd.DataFrame) -> dict[str, str]:
    out = {}
    for url, raw in zip(corpus["url"], corpus["html"]):
        kind = fixtures.spdf.sniff(raw)
        if kind == "spdf" and not (raw[5] & fixtures.spdf.FLAG_ENCRYPTED):
            try:
                out[url] = refmodel.extract_text(raw, CFG)
            except fixtures.spdf.PayloadError:
                pass  # corrupt → quarantine, no text row
    return out


@pytest.mark.parametrize("n_parts", [1, 8, 32])
def test_byte_identity(spark, corpus, n_parts):
    expected = _expected_texts(corpus)
    df = spark.createDataFrame(corpus).repartition(n_parts)
    res = extract_pages(df, CFG, run_id="t")
    got = {r["url"]: r["extracted_text"]
           for r in res.text.where("kind = 'spdf'").collect()}
    assert set(got) == set(expected)
    mismatches = {u for u in expected if got[u] != expected[u]}
    assert not mismatches, f"{len(mismatches)} urls differ, e.g. {sorted(mismatches)[:3]}"


def test_quarantine_rows(spark, corpus):
    df = spark.createDataFrame(corpus)
    res = extract_pages(df, CFG, run_id="t")
    q = {r["url"]: (r["kind"], r["error"]) for r in res.quarantine.collect()}
    enc_urls = {fixtures.url_for(i) for i in (11, 40)}
    cor_urls = {fixtures.url_for(i) for i in (17, 46)}
    assert {k for k, (kind, _) in q.items() if kind == "encrypted"} == enc_urls
    assert {k for k, (kind, _) in q.items() if kind == "corrupt"} == cor_urls
    for _, (kind, err) in q.items():
        assert err  # every quarantine row carries a message


def test_span_offset_invariant(spark, corpus):
    """F4 invariant: extracted_text[start_off:end_off] == text, for every span."""
    df = spark.createDataFrame(corpus)
    res = extract_pages(df, CFG, run_id="t")
    texts = {r["url"]: r["extracted_text"] for r in res.text.collect()}
    spans = res.spans.collect()
    assert len(spans) > 100
    for s in spans:
        doc = texts[s["url"]]
        assert doc[s["start_off"]:s["end_off"]] == s["text"], (
            s["url"], s["page"], s["start_off"], s["end_off"], s["text"],
            doc[s["start_off"] - 5:s["end_off"] + 5])


def test_spans_match_refmodel(spark, corpus):
    """Span rows (keys, geometry, conf, text) match the reference model's
    per-word searchable layer."""
    df = spark.createDataFrame(corpus)
    res = extract_pages(df, CFG, run_id="t")
    got = {}
    for r in res.spans.collect():
        got.setdefault(r["url"], []).append(
            (r["page"], r["block"], r["par"], r["line"], r["word"],
             r["left"], r["top"], r["width"], r["height"], r["conf"],
             r["text"], r["x"], r["y"], r["fontsize"]))
    n_checked = 0
    for url, raw in zip(corpus["url"], corpus["html"]):
        if fixtures.spdf.sniff(raw) != "spdf" or (raw[5] & fixtures.spdf.FLAG_ENCRYPTED):
            continue
        try:
            exp = refmodel.extract_spans(raw, CFG)
        except fixtures.spdf.PayloadError:
            continue
        exp_rows = sorted((e["page"], e["block"], e["par"], e["line"], e["word"],
                           e["left"], e["top"], e["width"], e["height"], e["conf"],
                           e["text"], e["x"], e["y"], e["fontsize"]) for e in exp)
        got_rows = sorted(got.get(url, []))
        assert got_rows == exp_rows, url
        n_checked += len(exp_rows)
    assert n_checked > 100


def test_metrics_table(spark, corpus):
    df = spark.createDataFrame(corpus)
    res = extract_pages(df, CFG, run_id="runA")
    m = res.metrics.toPandas()
    assert (m["run_id"] == "runA").all()
    assert m["n_pages"].sum() > 0
    assert m["error_urls"].iloc[0] == 4          # 2 encrypted + 2 corrupt
    assert (m["mean_conf"] >= 0).all()
    assert m["preprocessed_pages"].sum() > 0


def test_html_main_text(spark, corpus):
    df = spark.createDataFrame(corpus)
    res = extract_pages(df, CFG, run_id="t")
    rows = {r["url"]: r["extracted_text"]
            for r in res.text.where("kind = 'html'").collect()}
    html_ids = [23, 52]
    assert set(rows) == {fixtures.url_for(i) for i in html_ids}
    for i in html_ids:
        doc_text = dict((d[0], d[1]) for d in DOC_ROWS)[i]
        expected = "\n".join(fixtures.main_content_paragraphs(i, doc_text))
        assert rows[fixtures.url_for(i)] == expected
