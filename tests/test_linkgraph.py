"""Hyperlink extraction (kernels/html.py) and link-graph analytics
(analytics/graph.py): parser edge cases, kind dispatch, degree stats,
and integer PageRank against an independent numpy reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import graph
from image_pdf_ocr_suite_spark.kernels.html import (
    extract_links, extract_links_from_html)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def test_links_basic_document_order():
    html = ('<p><a href="/a">first</a> text <a href="/b">second link</a>'
            '</p><a href="http://x.example/c">third</a>')
    assert extract_links_from_html(html) == [
        ("/a", "first", False), ("/b", "second link", False),
        ("http://x.example/c", "third", False)]


def test_links_nested_anchor_autocloses():
    # browsers auto-close an <a> when another opens; text after the
    # closed inner link belongs to no link
    html = '<a href="/outer">out <a href="/inner">in</a> tail'
    assert extract_links_from_html(html) == [
        ("/outer", "out", False), ("/inner", "in", False)]


def test_links_unclosed_anchor_flushes_at_eof():
    assert extract_links_from_html('<a href="/x">dangling') == \
        [("/x", "dangling", False)]


def test_links_skip_script_and_hrefless():
    html = ('<a name="anchor">no href</a>'
            '<a href="/k"><script>var x = "ignored";</script>kept</a>')
    assert extract_links_from_html(html) == [("/k", "kept", False)]


def test_links_whitespace_normalized_anchor():
    html = '<a href="/w">  multi\n\n  word\ttext  </a>'
    assert extract_links_from_html(html) == [
        ("/w", "multi word text", False)]


def test_links_malformed_html_never_raises():
    # stray '<'s parse as data; the contract is no exception and the
    # real link survives with its href intact
    links = extract_links_from_html("<a href='/p'>x" + "<" * 50)
    assert [h for h, _, _ in links] == ["/p"]
    assert links[0][1].startswith("x")


# ---------------------------------------------------------------------------
# kernel dispatch + resolution
# ---------------------------------------------------------------------------

def test_extract_links_dispatch_and_resolution(spark):
    from image_pdf_ocr_suite_spark import payload as spdf
    from image_pdf_ocr_suite_spark.fixtures import build_document
    pages = spark.createDataFrame(
        [("https://h.example/dir/page.html",
          b'<html><body><a href="/root">r</a>'
          b'<a href="rel">l</a>'
          b'<a href="https://other.example/abs">a</a></body></html>'),
         ("https://h.example/spdf",
          spdf.encode(build_document(1, "word " * 8))),   # non-html: skipped
         ("https://h.example/null", None)],
        "url string, html binary")
    rows = sorted(map(tuple, extract_links(pages).collect()))
    assert rows == [
        ("https://h.example/dir/page.html", 0, "/root", "r",
         "https://h.example/root", False),
        ("https://h.example/dir/page.html", 1, "rel", "l",
         "https://h.example/dir/rel", False),
        ("https://h.example/dir/page.html", 2, "https://other.example/abs",
         "a", "https://other.example/abs", False),
    ]


def test_links_rel_nofollow_flag():
    html = ('<a href="/f" rel="nofollow">paid</a>'
            '<a href="/g" rel="NOFOLLOW sponsored">caps</a>'
            '<a href="/h" rel="noopener">open</a>'
            '<a href="/i">plain</a>')
    assert extract_links_from_html(html) == [
        ("/f", "paid", True), ("/g", "caps", True),
        ("/h", "open", False), ("/i", "plain", False)]


def test_robots_meta_directives():
    from image_pdf_ocr_suite_spark.kernels.html import (
        extract_page_meta, robots_meta_directives)
    assert robots_meta_directives("noindex, nofollow") == (True, True)
    assert robots_meta_directives("NOINDEX") == (True, False)
    assert robots_meta_directives("none") == (True, True)
    assert robots_meta_directives("index, follow") == (False, False)
    assert robots_meta_directives(None) == (False, False)
    meta = extract_page_meta(
        '<head><meta name="robots" content="noindex"></head>')
    assert meta["robots_meta"] == "noindex"


# ---------------------------------------------------------------------------
# graph analytics
# ---------------------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_degree_stats(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (4, 1)])
    out = {r.node: (r.out_deg, r.in_deg)
           for r in graph.degree_stats(e).collect()}
    assert out == {1: (2, 1), 2: (1, 1), 3: (0, 2), 4: (1, 0)}


def test_pagerank_cycle_is_stationary(spark):
    # on a directed cycle every node keeps exactly rank = scale
    n = 6
    e = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    ranks = graph.pagerank(e, n_iter=5, scale=10 ** 9).collect()
    assert all(r.rank == 10 ** 9 for r in ranks)


def test_pagerank_star_center_wins(spark):
    # leaves 1..5 all point at 0; 0 points back at 1
    e = _edges(spark, [(i, 0) for i in range(1, 6)] + [(0, 1)])
    out = {r.node: r.rank for r in graph.pagerank(e, n_iter=5).collect()}
    assert out[0] == max(out.values())
    assert out[0] > out[2] > 0


def _pagerank_numpy(edges, nodes, n_iter=5, damping_pct=85, scale=10 ** 9):
    """Independent single-process reference of the integer recurrence."""
    out_deg: dict[int, int] = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    rank = {v: scale for v in nodes}
    base = ((100 - damping_pct) * scale) // 100
    for _ in range(n_iter):
        acc = {v: 0 for v in nodes}
        for s, d in edges:
            acc[d] += rank[s] // out_deg[s]
        rank = {v: base + (damping_pct * acc[v]) // 100 for v in nodes}
    return rank


def test_pagerank_matches_numpy_reference(spark):
    n = 40
    edges = []
    for i in range(n):
        for j in range(1, 2 + i % 3):
            d = (i * 13 + j * 7) % n
            if d != i:
                edges.append((i, d))
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    got = {r.node: r.rank
           for r in graph.pagerank(_edges(spark, edges), nodes=nodes_df,
                                   n_iter=5).collect()}
    assert got == _pagerank_numpy(edges, range(n))


def test_pagerank_dangling_mass_leaks_monotonically(spark):
    # node 2 is dangling: total mass strictly decreases but stays positive
    e = _edges(spark, [(0, 1), (1, 2)])
    total = sum(r.rank for r in graph.pagerank(e, n_iter=5).collect())
    assert 0 < total < 3 * 10 ** 9
