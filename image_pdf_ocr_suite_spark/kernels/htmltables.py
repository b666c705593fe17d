"""HTML table extraction: DOM tables → structured grid rows.

North-rule extraction-tier operator (DOM heuristics family, next to the
text-density main-content strip in ``kernels/html.py``): linearize every
``<table>`` in a page into relational rows

    (table_idx, row_idx, col_idx, cell, colspan, rowspan, is_header)

so a training-data pipeline can mine structured content (the reference
pipeline has no table path; Common-Crawl-style HTML is full of them).
Pure stdlib ``html.parser`` — no external deps — run as an Arrow-batched
``mapInPandas`` kernel, one pass per page, map-only (no shuffle: grid
resolution is per-document work).

Grid semantics (the real DOM rules, HTML 5 §4.9 table model, bounded):

- tables are indexed in DOCUMENT ORDER of their ``<table>`` open tags
  (nested tables get their own index; their cells never leak into the
  enclosing cell's text);
- ``row_idx`` counts ``<tr>`` within a table (header rows included),
  ``col_idx`` is the resolved GRID column of the cell's left edge;
- ``colspan`` advances the column cursor; ``rowspan`` blocks the spanned
  columns for the following rows (occupancy map, decremented at row
  close), so later rows' cells are shifted exactly as a browser lays
  them out;
- implicit closes are handled: ``<tr>``/``<td>``/``<th>`` open tags
  close any open row/cell, ``</table>`` closes both (real-world HTML
  routinely omits them);
- cell text is the concatenated character data of the cell's own inline
  content (entities decoded, whitespace collapsed), ``is_header`` marks
  ``<th>`` cells; ``colspan``/``rowspan`` attributes parse defensively
  (non-numeric → 1, clamped to [1, 1000]).

The driver-checked query synthesizes a deterministic table page per
document (``build_table_html``: token-addressed cells, a nav table every
third doc, a colspan every even doc, a rowspan every fifth doc, inline
markup + escaped entities + omitted close tags as noise) and parses it
back; the DuckDB oracle REGENERATES the expected grid with
``generate_series`` + ``string_split`` arithmetic — the layout rules are
checked end-to-end against an independent relational spelling, not
against the parser itself.
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd

MAX_SPAN = 1000

_SKIP_TAGS = {"script", "style", "noscript", "template"}

# the HTML "rules for parsing non-negative integers": skip ASCII
# whitespace, take the leading ASCII-digit run, ignore any trailer —
# so colspan="50%" parses 50 (as in browsers), while Python int()'s
# extras (underscores, non-ASCII digits) are NOT accepted
_SPAN_RE = re.compile(r"[ \t\n\f\r]*([0-9]+)")


def _span_attr(attrs, name: str) -> int:
    for k, v in attrs:
        if k == name:
            m = _SPAN_RE.match(str(v)) if v is not None else None
            if m is None:
                return 1
            return max(1, min(MAX_SPAN, int(m.group(1))))
    return 1


class _TableCtx:
    __slots__ = ("idx", "row_idx", "col", "blocked", "cell", "rows",
                 "row_open")

    def __init__(self, idx: int) -> None:
        self.idx = idx
        self.row_idx = -1
        self.col = 0
        self.row_open = False
        # col -> number of rows (INCLUDING the origin row) still blocked;
        # decremented at row close, so a rowspan=2 written in row r holds
        # value 1 after r closes and blocks exactly row r+1.
        self.blocked: dict[int, int] = {}
        # open cell: [col_idx, colspan, rowspan, is_header, parts]
        self.cell: list | None = None
        self.rows: list[tuple] = []


class _TableParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[tuple] = []
        self._tables: list[_TableCtx] = []
        self._n_tables = 0
        self._skip_depth = 0

    # -- row / cell lifecycle -------------------------------------------
    def _close_cell(self, t: _TableCtx) -> None:
        if t.cell is None:
            return
        col, cs, rs, hdr, parts = t.cell
        text = " ".join("".join(parts).split())
        t.rows.append((t.idx, t.row_idx, col, text, cs, rs, hdr))
        if rs > 1:
            for c in range(col, col + cs):
                t.blocked[c] = max(t.blocked.get(c, 0), rs)
        t.col = col + cs
        t.cell = None

    def _close_row(self, t: _TableCtx) -> None:
        self._close_cell(t)
        if t.row_open:  # idempotent: </tr> AND the next <tr> both land here
            done = [c for c in t.blocked if t.blocked[c] <= 1]
            for c in t.blocked:
                t.blocked[c] -= 1
            for c in done:
                del t.blocked[c]
            t.row_open = False
        t.col = 0

    def _open_cell(self, t: _TableCtx, attrs, header: bool) -> None:
        self._close_cell(t)
        if not t.row_open:  # cell with omitted <tr>: implicit new row
            t.row_idx += 1
            t.row_open = True
        while t.blocked.get(t.col, 0) > 0:
            t.col += 1
        t.cell = [t.col, _span_attr(attrs, "colspan"),
                  _span_attr(attrs, "rowspan"), header, []]

    # -- parser events ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            # tables inside <noscript>/<template> are unrendered content
            # (script/style bodies never get here — HTMLParser treats
            # them as raw data); ignore their structure entirely
            return
        if tag == "table":
            self._tables.append(_TableCtx(self._n_tables))
            self._n_tables += 1
            return
        if not self._tables:
            return
        t = self._tables[-1]
        if tag == "tr":
            self._close_row(t)
            t.row_idx += 1
            t.row_open = True
        elif tag in ("td", "th"):
            self._open_cell(t, attrs, tag == "th")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth or not self._tables:
            return
        t = self._tables[-1]
        if tag == "table":
            self._close_row(t)
            self.out.extend(t.rows)
            self._tables.pop()
        elif tag == "tr":
            self._close_row(t)
        elif tag in ("td", "th"):
            self._close_cell(t)

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not self._tables:
            return
        t = self._tables[-1]
        if t.cell is not None:
            t.cell[4].append(data)

    def finish(self) -> list[tuple]:
        # unclosed tables (truncated page): flush what was parsed
        while self._tables:
            t = self._tables[-1]
            self._close_row(t)
            self.out.extend(t.rows)
            self._tables.pop()
        # tables emit in CLOSE order (inner first); restore document
        # order of the table open tags
        self.out.sort(key=lambda r: (r[0], r[1], r[2]))
        return self.out


def parse_tables(page: str) -> list[tuple]:
    """All table cells of one HTML page as
    [(table_idx, row_idx, col_idx, cell, colspan, rowspan, is_header)]."""
    p = _TableParser()
    try:
        p.feed(page)
        p.close()
    except Exception:
        pass  # truncated/malformed markup: keep what parsed
    return p.finish()


# ---------------------------------------------------------------------------
# Deterministic synthesis for the driver-checked query.

def build_table_html(doc_id: int, text: str | None) -> str:
    """A table page addressed entirely by (doc_id, text tokens) — every
    layout choice below is mirrored by the query's DuckDB oracle:

    - ncols = 2 + doc_id % 3, data rows nrows = 1 + doc_id % 4
      (row 0 is the <th> header: cells ``h0..h{ncols-1}``);
    - data cell at grid col c of row r holds token
      ``(doc_id + r*ncols + c) % ntokens`` (html-escaped; ``e{r}c{c}``
      when the document has no tokens);
    - doc_id % 3 == 0: a preceding one-row nav table (Home | About) —
      link markup, an omitted ``</td>``;
    - doc_id % 2 == 0: the LAST data row's first cell has colspan=2 (the
      row then has ncols-1 cells, later cells shifted one column right);
    - doc_id % 5 == 0 and nrows >= 2: data row 1's first cell has
      rowspan=2, so data row 2 omits its first cell and its cells sit at
      cols 1..ncols-1 via the occupancy map;
    - noise: inline <i>/<b> wrappers ((r+c) % 3 == 0), a <script> blob,
      surrounding <p> boilerplate — none of it may leak into cells.
    """
    toks = [t for t in text.split(" ") if t] if isinstance(text, str) else []
    nt = len(toks)
    ncols = 2 + doc_id % 3
    nrows = 1 + doc_id % 4
    has_nav = doc_id % 3 == 0
    has_colspan = doc_id % 2 == 0
    has_rowspan = doc_id % 5 == 0 and nrows >= 2

    def cell_text(r: int, c: int) -> str:
        if nt == 0:
            return f"e{r}c{c}"
        return _html.escape(toks[(doc_id + r * ncols + c) % nt])

    parts = ["<html><head><script>var cfg = {rows: 9, mode: 'x'};"
             "</script></head><body><p>Report preamble text.</p>"]
    if has_nav:
        parts.append('<table class="nav"><tr><td><a href="/">Home</a>'
                     '<td><a href="/about">About</a></td></tr></table>')
    parts.append("<table><tr>")
    for c in range(ncols):
        parts.append(f"<th><b>h{c}</b></th>")
    parts.append("</tr>")
    for r in range(1, nrows + 1):
        parts.append("<tr>")
        if has_rowspan and r == 2:
            cols = range(1, ncols)          # col 0 blocked by the rowspan
        elif has_colspan and r == nrows:
            cols = None                     # handled below (colspan row)
        else:
            cols = range(ncols)
        if cols is None:
            parts.append(f'<td colspan="2">{cell_text(r, 0)}</td>')
            for c in [k + 1 for k in range(1, ncols - 1)]:
                body = cell_text(r, c)
                if (r + c) % 3 == 0:
                    body = f"<i>{body}</i>"
                parts.append(f"<td>{body}</td>")
        else:
            for c in cols:
                body = cell_text(r, c)
                if (r + c) % 3 == 0:
                    body = f"<i>{body}</i>"
                span = ' rowspan="2"' if (has_rowspan and r == 1
                                          and c == 0) else ""
                parts.append(f"<td{span}>{body}</td>")
        parts.append("</tr>")
    parts.append("</table><p>Footer boilerplate.</p></body></html>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# Spark operators.

_SCHEMA = ("doc_id bigint, table_idx int, row_idx int, col_idx int, "
           "cell string, colspan int, rowspan int, is_header boolean")


def linearize_tables(grid_df):
    """Table grid rows → one training-text serialization per table:
    (doc_id, table_idx, n_rows, n_cells, table_text) with cells joined
    ``" | "`` in column order and rows joined ``"\\n"`` in row order —
    the flatten step an LLM data pipeline applies before tokenizing
    tabular content.

    Pure Catalyst: two short-key aggregations (row strings, then table
    strings) over the already-short cell rows; the per-table arrays are
    bounded by table size, so the interpreted higher-order ``transform``
    is fine here (CLAUDE.md round-2 rule applies to corpus-wide
    literal-matrix math, not ≤dozens-element arrays)."""
    from pyspark.sql import functions as F

    rows = (grid_df
            .groupBy("doc_id", "table_idx", "row_idx")
            .agg(F.array_join(
                     F.transform(
                         F.sort_array(F.collect_list(
                             F.struct("col_idx", "cell"))),
                         lambda x: x["cell"]),
                     " | ").alias("row_text"),
                 F.count(F.lit(1)).alias("n_row_cells")))
    return (rows
            .groupBy("doc_id", "table_idx")
            .agg(F.array_join(
                     F.transform(
                         F.sort_array(F.collect_list(
                             F.struct("row_idx", "row_text"))),
                         lambda x: x["row_text"]),
                     "\n").alias("table_text"),
                 F.count(F.lit(1)).cast("int").alias("n_rows"),
                 F.sum("n_row_cells").cast("int").alias("n_cells"))
            .select("doc_id", "table_idx", "n_rows", "n_cells",
                    "table_text"))


def _grid_kernel(pages: Iterator[tuple]) -> pd.DataFrame:
    """One batch of (doc_id, html) pairs → the grid-rows DataFrame
    (single copy of the row accumulation + nullable-dtype construction
    shared by both kernels; Int64 per the round-5h nullable rule)."""
    ids, ti, ri, ci, cells, cs, rs, hdr = [], [], [], [], [], [], [], []
    for did, page in pages:
        for (t, r, c, txt, c_n, r_n, h) in parse_tables(page):
            ids.append(did)
            ti.append(t)
            ri.append(r)
            ci.append(c)
            cells.append(txt)
            cs.append(c_n)
            rs.append(r_n)
            hdr.append(h)
    return pd.DataFrame({
        "doc_id": pd.array(ids, dtype="Int64"),
        "table_idx": pd.array(ti, dtype="Int32"),
        "row_idx": pd.array(ri, dtype="Int32"),
        "col_idx": pd.array(ci, dtype="Int32"),
        "cell": cells, "colspan": pd.array(cs, dtype="Int32"),
        "rowspan": pd.array(rs, dtype="Int32"),
        "is_header": pd.array(hdr, dtype="boolean")})


def extract_tables(pages_df, id_col: str = "doc_id",
                   html_col: str = "page_html"):
    """Grid rows of every table of every page: map-only Arrow kernel
    (one parse per page, no shuffle)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _grid_kernel(
                (did, page) for did, page in zip(pdf[id_col], pdf[html_col])
                if isinstance(page, str))

    from image_pdf_ocr_suite_spark.partitioning import fan_out_small

    return fan_out_small(pages_df.select(id_col, html_col)).mapInPandas(
        kernel, schema=_SCHEMA)


def table_rows_from_docs(docs_df):
    """The driver-checked composition: synthesize the deterministic
    table page per document and parse it back, FUSED in one kernel
    (chained Python stages barely scale — round-5 rule)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _grid_kernel(
                (int(did), build_table_html(int(did), text))
                for did, text in zip(pdf["doc_id"], pdf["text"]))

    from image_pdf_ocr_suite_spark.partitioning import fan_out_small

    return fan_out_small(docs_df.select("doc_id", "text")).mapInPandas(
        kernel, schema=_SCHEMA)
