"""Round-5n operators: microdata extraction, heading-path sections,
temperature-based corpus mixing."""
from __future__ import annotations

import hashlib
import math

from image_pdf_ocr_suite_spark.kernels import microdata as M
from image_pdf_ocr_suite_spark.analytics import sections as S


PAGE = """<html><body>
<div itemscope itemtype="https://schema.org/Article extraTok">
  <h1 itemprop="name headline">Big <b>Story</b>\t 7</h1>
  <meta itemprop="datePublished" content="2026-01-02">
  <a itemprop="url" href="https://x/1">link text ignored</a>
  <time itemprop="dateModified" datetime="2026-02-03">Feb 3</time>
  <time itemprop="dateSeen">March  3</time>
  <img itemprop="image" src="pic.png">
  <div itemprop="author" itemscope itemtype="https://schema.org/Person">
    <span itemprop="name">Ann</span>
  </div>
</div>
<template><div itemscope><span itemprop="ghost">x</span></div></template>
<noscript><meta itemprop="ghost2" content="y"></noscript>
<span itemprop="orphanNoItem">ignored</span>
<div itemscope itemtype="https://schema.org/Thing">
  <span itemprop="desc">uses <script>var x="no";</script>real text</span>
</div>
</body></html>"""


def test_microdata_article_rows():
    rows = M.microdata_rows(PAGE)
    art = [r for r in rows if r[0] == 0]
    # multi-token itemprop -> one row per name, shared value, seq order
    assert art[0] == (0, "https://schema.org/Article", "name", 0,
                      "Big Story 7", "text", None)
    assert art[1] == (0, "https://schema.org/Article", "headline", 1,
                      "Big Story 7", "text", None)
    by_prop = {r[2]: r for r in art}
    assert by_prop["datePublished"][4:6] == ("2026-01-02", "attr")
    assert by_prop["url"][4:6] == ("https://x/1", "attr")
    assert by_prop["dateModified"][4:6] == ("2026-02-03", "attr")
    assert by_prop["dateSeen"][4:6] == ("March 3", "text")  # no datetime
    assert by_prop["image"][4:6] == ("pic.png", "attr")
    # nested itemscope+itemprop -> item-valued row pointing at child 1
    assert by_prop["author"][4:7] == (None, "item", 1)
    person = [r for r in rows if r[0] == 1]
    assert person == [(1, "https://schema.org/Person", "name", 0, "Ann",
                       "text", None)]


def test_microdata_gates_and_raw_bodies():
    rows = M.microdata_rows(PAGE)
    props = {r[2] for r in rows}
    assert "ghost" not in props and "ghost2" not in props
    assert "orphanNoItem" not in props
    # template's itemscope consumed no item_idx: Thing is item 2
    thing = [r for r in rows if r[2] == "desc"]
    assert thing == [(2, "https://schema.org/Thing", "desc", 0,
                      "uses real text", "text", None)]


def test_microdata_edges():
    # itemtype absent -> NULL; value element self-closed -> empty text
    rows = M.microdata_rows(
        '<div itemscope><span itemprop="a"/><meta itemprop="b" '
        'content="c"></div>')
    assert rows[0] == (0, None, "a", 0, "", "text", None)
    assert rows[1] == (0, None, "b", 1, "c", "attr", None)
    # unclosed text collector flushes at close()
    rows = M.microdata_rows('<div itemscope><span itemprop="x">tail')
    assert rows == [(0, None, "x", 0, "tail", "text", None)]
    # repeated property names stay distinct via prop_seq
    rows = M.microdata_rows(
        '<div itemscope><meta itemprop="k" content="1">'
        '<meta itemprop="k" content="2"></div>')
    assert [(r[3], r[4]) for r in rows] == [(0, "1"), (1, "2")]
    # hostile markup never raises
    assert M.microdata_rows("<div itemscope><<<>><span itemprop='") \
        is not None
    assert M.microdata_rows("") == []


def test_microdata_sibling_items_and_same_tag_nesting():
    rows = M.microdata_rows(
        '<div itemscope itemtype="A"><span itemprop="p">one</span></div>'
        '<div itemscope itemtype="B"><span itemprop="q">'
        '<span>inner</span> two</span></div>')
    assert rows == [
        (0, "A", "p", 0, "one", "text", None),
        (1, "B", "q", 0, "inner two", "text", None)]


SECTION_PAGE = """<html><body>Intro  text.
<h1>Setup</h1><p>Install it.</p>
<h2>Linux <b>x86</b></h2>apt stuff<script>var x=1;</script>
<h3>Deps</h3><p>gcc</p>
<h2>Mac</h2>brew stuff
<h1>Usage</h1>run it
<h4>Empty</h4>
<template><h1>Ghost</h1>never</template>
</body></html>"""


def test_section_rows_outline():
    rows = S.section_rows(SECTION_PAGE)
    assert rows == [
        (0, 0, None, "", "Intro text.", 11),
        (1, 1, "Setup", "Setup", "Install it.", 11),
        (2, 2, "Linux x86", "Setup > Linux x86", "apt stuff", 9),
        (3, 3, "Deps", "Setup > Linux x86 > Deps", "gcc", 3),
        (4, 2, "Mac", "Setup > Mac", "brew stuff", 10),
        (5, 1, "Usage", "Usage", "run it", 6),
        (6, 4, "Empty", "Usage > Empty", "", 0),
    ]


def test_section_edges():
    # no headings + no text -> nothing; text only -> one preamble row
    assert S.section_rows("<p>   </p>") == []
    assert S.section_rows("<p>just text</p>") == \
        [(0, 0, None, "", "just text", 9)]
    # empty preamble suppressed, bare heading kept
    assert S.section_rows("<h2>A</h2>") == [(0, 2, "A", "A", "", 0)]
    # unclosed heading: its text lands in a trailing recovery section
    # (the flush already happened at the heading's start tag)
    assert S.section_rows("<p>pre</p><h1>dangling") == \
        [(0, 0, None, "", "pre", 3), (1, 0, None, "", "dangling", 8)]
    # sibling h1 replaces, not nests
    rows = S.section_rows("<h1>A</h1>x<h1>B</h1>y")
    assert [r[3] for r in rows] == ["A", "B"]
    # skipping levels is allowed (h1 -> h3): path keeps both
    rows = S.section_rows("<h1>A</h1><h3>C</h3>z")
    assert rows[1][3] == "A > C"
    assert S.section_rows("") == []


def test_spark_microdata_and_sections(spark):
    pages = spark.createDataFrame(
        [("u1", PAGE.encode()), ("u2", SECTION_PAGE.encode()),
         ("u3", None)],
        "url string, html binary")
    md = M.extract_microdata(pages).collect()
    assert {r.url for r in md} == {"u1"}
    assert len(md) == len(M.microdata_rows(PAGE))
    sec = S.section_chunks(pages).where("url = 'u2'").collect()
    assert len(sec) == 7
    got = sorted((r.sec_idx, r.level, r.heading, r.path, r.text,
                  r.n_chars) for r in sec)
    assert got == S.section_rows(SECTION_PAGE)


# ---- temperature mixing ------------------------------------------------

def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) \
        % 10000


def test_mixing_plan_exact(spark):
    from image_pdf_ocr_suite_spark.analytics import mixing as X

    rows = [(i, "big" if i < 900 else ("mid" if i < 990 else "small"))
            for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")
    plan = {r.source: r for r in X.mixing_plan(docs, 2500).collect()}
    n = {"big": 900, "mid": 90, "small": 10}
    w = {s: math.isqrt(v) for s, v in n.items()}
    tw = sum(w.values())
    budget = 1000 * 2500 // 10000
    for s in n:
        assert plan[s].n_docs == n[s]
        assert plan[s].weight == w[s]
        alloc = budget * w[s] // tw
        assert plan[s].alloc == alloc
        assert plan[s].rate_bp == min(10000, 10000 * alloc // n[s])
    # sqrt temperature flattens: small's rate far above big's
    assert plan["small"].rate_bp > plan["big"].rate_bp
    # total allocation never exceeds the budget
    assert sum(plan[s].alloc for s in n) <= budget


def test_temperature_sample_deterministic(spark):
    from image_pdf_ocr_suite_spark.analytics import mixing as X

    rows = [(i, "a" if i % 3 else "b") for i in range(600)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")
    plan = {r.source: r.rate_bp
            for r in X.mixing_plan(docs, 4000).collect()}
    got = sorted(r.doc_id for r in
                 X.temperature_sample(docs, 4000).collect())
    want = sorted(i for i, s in rows if _bucket(i) < plan[s])
    assert got == want
    # idempotent: same call -> same corpus
    again = sorted(r.doc_id for r in
                   X.temperature_sample(docs, 4000).collect())
    assert got == again
    rep = {r.source: r for r in X.mixture_report(docs, 4000).collect()}
    for s in ("a", "b"):
        assert rep[s].n_sampled == sum(1 for i, t in rows
                                       if t == s and _bucket(i) < plan[s])


def test_mixing_budget_validation(spark):
    from image_pdf_ocr_suite_spark.analytics import mixing as X
    import pytest

    docs = spark.createDataFrame([(1, "a")], "doc_id bigint, source string")
    with pytest.raises(ValueError):
        X.mixing_plan(docs, 0)
    with pytest.raises(ValueError):
        X.mixing_plan(docs, 10001)
