"""HTML table extraction (kernels/htmltables.py).

Pins: the HTML 5 table-model grid rules (colspan cursor advance, rowspan
occupancy blocking with idempotent row close, implicit <tr>/<td> closes,
nested tables isolated in document order), the deterministic synthesis
round-trip against an INDEPENDENT pure-Python grid generator (the same
arithmetic the DuckDB oracle spells relationally), defensive span-attr
parsing, and the Spark kernel schema/null contracts.
"""

from __future__ import annotations

import pytest

from image_pdf_ocr_suite_spark.kernels import htmltables as ht


def _expected_grid(doc_id: int, text: str | None) -> list[tuple]:
    """Independent spelling of build_table_html's documented layout —
    mirrors the DuckDB oracle, shares no code with the parser."""
    toks = [t for t in text.split(" ") if t] if isinstance(text, str) else []
    nt = len(toks)
    ncols = 2 + doc_id % 3
    nrows = 1 + doc_id % 4
    has_nav = doc_id % 3 == 0
    has_colspan = doc_id % 2 == 0
    has_rowspan = doc_id % 5 == 0 and nrows >= 2
    rows: list[tuple] = []
    base = 0
    if has_nav:
        rows += [(0, 0, 0, "Home", 1, 1, False),
                 (0, 0, 1, "About", 1, 1, False)]
        base = 1
    for c in range(ncols):
        rows.append((base, 0, c, f"h{c}", 1, 1, True))

    def ct(r: int, c: int) -> str:
        if nt == 0:
            return f"e{r}c{c}"
        # the parser collapses cell whitespace (str.split()); tokens of
        # the single-space contract can carry tabs/NBSP — mirror it
        return " ".join(toks[(doc_id + r * ncols + c) % nt].split())

    for r in range(1, nrows + 1):
        if has_rowspan and r == 2:
            for c in range(1, ncols):
                rows.append((base, r, c, ct(r, c), 1, 1, False))
        elif has_colspan and r == nrows:
            rows.append((base, r, 0, ct(r, 0), 2, 1, False))
            for c in [k + 1 for k in range(1, ncols - 1)]:
                rows.append((base, r, c, ct(r, c), 1, 1, False))
        else:
            for c in range(ncols):
                rs = 2 if (has_rowspan and r == 1 and c == 0) else 1
                rows.append((base, r, c, ct(r, c), 1, rs, False))
    return sorted(rows)


def test_synthesis_roundtrip_matches_independent_grid():
    for doc_id in range(0, 120):
        text = " ".join(f"tok{doc_id}_{i}" for i in range(doc_id % 7))
        got = sorted(ht.parse_tables(ht.build_table_html(doc_id, text)))
        assert got == _expected_grid(doc_id, text), f"doc {doc_id}"
    # None text → e{r}c{c} fallback cells
    got = sorted(ht.parse_tables(ht.build_table_html(7, None)))
    assert got == _expected_grid(7, None)
    # tokens carrying non-space whitespace (legal under the
    # single-space token contract) land collapsed, on both sides
    for doc_id, text, collapsed in [(1, "a b x\ty", "x y"),
                                    (5, "p\u3000q lone", "p q")]:
        got = sorted(ht.parse_tables(ht.build_table_html(doc_id, text)))
        assert got == _expected_grid(doc_id, text)
        assert collapsed in {c[3] for c in got}


def test_rowspan_occupancy_blocks_and_frees():
    page = ('<table><tr><td rowspan="3" colspan="2">big<td>x</tr>'
            '<tr><td>y</tr><tr><td>z</tr><tr><td>w</tr></table>')
    assert ht.parse_tables(page) == [
        (0, 0, 0, "big", 2, 3, False), (0, 0, 2, "x", 1, 1, False),
        (0, 1, 2, "y", 1, 1, False), (0, 2, 2, "z", 1, 1, False),
        (0, 3, 0, "w", 1, 1, False)]


def test_implicit_closes_and_missing_tr():
    # omitted </td>, omitted </tr>, truncated page, cell before any <tr>
    assert ht.parse_tables("<table><tr><td>a<td>b") == [
        (0, 0, 0, "a", 1, 1, False), (0, 0, 1, "b", 1, 1, False)]
    assert ht.parse_tables("<table><td>no-tr</table>") == [
        (0, 0, 0, "no-tr", 1, 1, False)]
    # double row close (</tr> then <tr>) must decrement occupancy ONCE
    page = ('<table><tr><td rowspan="2">a</td><td>b</td></tr>'
            '<tr><td>c</td></tr><tr><td>d</td></tr></table>')
    assert ht.parse_tables(page) == [
        (0, 0, 0, "a", 1, 2, False), (0, 0, 1, "b", 1, 1, False),
        (0, 1, 1, "c", 1, 1, False), (0, 2, 0, "d", 1, 1, False)]


def test_nested_table_isolated_document_order():
    page = ('<table><tr><td>outer <table><tr><td>inner</td></tr>'
            '</table> tail</td></tr></table>')
    assert ht.parse_tables(page) == [
        (0, 0, 0, "outer tail", 1, 1, False),
        (1, 0, 0, "inner", 1, 1, False)]


def test_span_attrs_defensive_and_text_rules():
    assert ht.parse_tables(
        '<table><tr><td colspan="zz" rowspan="-3">bad</td></tr>'
        "</table>") == [(0, 0, 0, "bad", 1, 1, False)]
    # the HTML non-negative-integer rules: leading ASCII digits win,
    # trailers ignored ("50%" → 50 as in browsers); Python-int extras
    # (underscores, non-ASCII digits) are NOT accepted
    got = ht.parse_tables('<table><tr><td colspan=" 3%x">a</td>'
                          '<td colspan="2_0">b</td>'
                          '<td rowspan="٢">c</td></tr></table>')
    assert [(r[2], r[4], r[5]) for r in got] == \
        [(0, 3, 1), (3, 2, 1), (5, 1, 1)]
    # entity decode, whitespace collapse, inline markup, skip tags
    page = ('<table><tr><td> a &amp;\n <b>b</b> '
            "<script>var t = '<td>ignored';</script></td></tr></table>")
    assert ht.parse_tables(page) == [(0, 0, 0, "a & b", 1, 1, False)]
    # spans capped at MAX_SPAN
    got = ht.parse_tables(
        f'<table><tr><td colspan="{ht.MAX_SPAN * 5}">w</td></tr></table>')
    assert got[0][4] == ht.MAX_SPAN


def test_skip_region_tables_ignored():
    # <noscript>/<template> content is parsed as markup by HTMLParser
    # (unlike script/style raw bodies) but is unrendered — its tables
    # must not be extracted, and table indexing must not count them
    page = ("<template><table><tr><td>ghost</td></tr></table></template>"
            "<table><tr><td>real</td></tr></table>")
    assert ht.parse_tables(page) == [(0, 0, 0, "real", 1, 1, False)]
    inner = ("<table><tr><td>a"
             "<noscript><table><tr><td>n</td></tr></table></noscript>"
             "b</td></tr></table>")
    # "a" and "b" abut with no source whitespace → concatenate raw
    assert ht.parse_tables(inner) == [(0, 0, 0, "ab", 1, 1, False)]


def test_no_tables_and_cell_free_data():
    assert ht.parse_tables("<p>just text</p>") == []
    # data between cells (table whitespace) never creates rows
    assert ht.parse_tables("<table><tr> \n <td>x</td> q </tr></table>") \
        == [(0, 0, 0, "x", 1, 1, False)]


def test_linearize_tables(spark):
    docs = spark.createDataFrame([(3, "aa bb cc")],
                                 "doc_id bigint, text string")
    out = {(r["doc_id"], r["table_idx"]):
           (r["n_rows"], r["n_cells"], r["table_text"])
           for r in ht.linearize_tables(
               ht.table_rows_from_docs(docs)).collect()}
    # doc 3: nav table (1 row) + main table (header + 4 data rows,
    # ncols=2); grid cells from the independent generator
    grid = _expected_grid(3, "aa bb cc")
    want_main = "\n".join(
        " | ".join(c[3] for c in grid if c[0] == 1 and c[1] == r)
        for r in range(5))
    assert out[(3, 0)] == (1, 2, "Home | About")
    assert out[(3, 1)] == (5, 10, want_main)


def test_oracle_whitespace_parity(spark, tmp_path):
    # hostile corpus: tokens carrying tab/NBSP/ideographic-space (legal
    # under the single-space contract) — the kernel's Python collapse
    # and the oracle's shared-whitespace-class regexp must agree
    import duckdb

    import __spark_entry__ as entry

    rows = [(0, "a\tb nb sp w　ide ok"), (1, "\t lone"),
            (2, None), (5, "a\tb y z"), (7, " start end ")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    tmp = str(tmp_path / "docs")
    df.write.mode("overwrite").parquet(tmp)
    got = sorted(tuple(r) for r in ht.table_rows_from_docs(
        spark.read.parquet(tmp)).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{tmp}/*.parquet')")
    want = sorted(tuple(r) for r in con.sql(
        entry._HTML_TABLES_ORACLE).fetchall())
    assert got == want
    cells = {r[4] for r in got}
    assert "a b" in cells  # doc 5's tab token, collapsed identically
    assert "" in cells     # doc 1's all-whitespace token → empty cell


def test_spark_kernels(spark):
    docs = spark.createDataFrame(
        [(3, "aa bb cc"), (4, None), (10, "x y")],
        "doc_id bigint, text string")
    rows = ht.table_rows_from_docs(docs).collect()
    got = sorted((r["doc_id"], r["table_idx"], r["row_idx"], r["col_idx"],
                  r["cell"], r["colspan"], r["rowspan"], r["is_header"])
                 for r in rows)
    want = sorted(
        [(d,) + t for d, txt in [(3, "aa bb cc"), (4, None), (10, "x y")]
         for t in _expected_grid(d, txt)])
    assert got == want
    # generic extractor over a raw html column
    pages = spark.createDataFrame(
        [(1, "<table><tr><th>h</th></tr></table>"), (2, None)],
        "doc_id bigint, page_html string")
    out = ht.extract_tables(pages).collect()
    assert [(r["doc_id"], r["cell"], r["is_header"]) for r in out] == \
        [(1, "h", True)]
