"""Property-based tests (hypothesis) for the HTML table-model parser
(kernels/htmltables.py) — differential layout checking against an
INDEPENDENT 2D-occupancy model over arbitrary span structures (no Spark
session needed):

- render(grid) → parse == model_layout(grid) for random tables with
  colspan/rowspan 1-3, including overlapping-extent interactions the
  deterministic synthesis never produces (the parser's per-column
  max-remaining rule must equal the true 2D occupancy union — extents
  are contiguous downward from their placement row, so they coincide;
  the property pins that equivalence);
- WordPiece greedy encode: concatenation identity and piece-membership
  laws over arbitrary vocabularies.
"""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from image_pdf_ocr_suite_spark.analytics import wordpiece as wp
from image_pdf_ocr_suite_spark.kernels import htmltables as ht

# a table = list of rows, each row = list of (colspan, rowspan, header)
cells = st.tuples(st.integers(1, 3), st.integers(1, 3), st.booleans())
rows = st.lists(cells, min_size=1, max_size=4)
tables = st.lists(rows, min_size=1, max_size=5)


def _render(table: list[list[tuple[int, int, bool]]],
            omit_closes: bool = False) -> str:
    out = ["<table>"]
    for r, row in enumerate(table):
        out.append("<tr>")
        for k, (cs, rs, hdr) in enumerate(row):
            tag = "th" if hdr else "td"
            out.append(f'<{tag} colspan="{cs}" rowspan="{rs}">c{r}_{k}')
            if not omit_closes:
                out.append(f"</{tag}>")
        if not omit_closes:
            out.append("</tr>")
    out.append("</table>")
    return "".join(out)


def _model_layout(table: list[list[tuple[int, int, bool]]]) -> list[tuple]:
    """Independent 2D-occupancy layout: a set of occupied (row, col)
    cells; each cell's start column is the first unoccupied column of
    its row, and the cell covers its full cs x rs extent."""
    occupied: set[tuple[int, int]] = set()
    out = []
    for r, row in enumerate(table):
        col = 0
        for k, (cs, rs, hdr) in enumerate(row):
            while (r, col) in occupied:
                col += 1
            for rr in range(r, r + rs):
                for cc in range(col, col + cs):
                    occupied.add((rr, cc))
            out.append((0, r, col, f"c{r}_{k}", cs, rs, hdr))
            col += cs
    return sorted(out)


@settings(max_examples=300, deadline=None)
@given(table=tables, omit=st.booleans())
def test_parse_matches_2d_occupancy_model(table, omit):
    got = sorted(ht.parse_tables(_render(table, omit_closes=omit)))
    assert got == _model_layout(table)


@settings(max_examples=100, deadline=None)
@given(t1=tables, t2=tables)
def test_two_tables_index_in_document_order(t1, t2):
    page = _render(t1) + "<p>between</p>" + _render(t2)
    got = ht.parse_tables(page)
    assert sorted({r[0] for r in got}) == [0, 1]
    assert sorted(r[1:] for r in got if r[0] == 0) == \
        [m[1:] for m in _model_layout(t1)]
    assert sorted(r[1:] for r in got if r[0] == 1) == \
        [m[1:] for m in _model_layout(t2)]


# --- WordPiece greedy-encode laws -------------------------------------

vocab_pieces = st.text(alphabet="abc", min_size=1, max_size=4)


@settings(max_examples=300, deadline=None)
@given(word=st.text(alphabet="abc", min_size=1, max_size=10),
       extra=st.sets(vocab_pieces, max_size=8))
def test_greedy_encode_concatenation_and_membership(word, extra):
    vocab = {ch for ch in "abc"} | {"##" + ch for ch in "abc"}
    vocab |= extra | {"##" + p for p in extra}
    max_len = max(len(p) - (2 if p.startswith("##") else 0)
                  for p in vocab)
    pieces = wp.greedy_encode(word, vocab, max_len)
    # full alphabet coverage → never [UNK]; pieces concatenate to the
    # word with ## markers stripped, every piece is in the vocab, and
    # only the first piece is continuation-free
    assert pieces != [wp.UNK]
    assert "".join(p[2:] if p.startswith("##") else p
                   for p in pieces) == word
    assert all(p in vocab for p in pieces)
    assert not pieces[0].startswith("##")
    assert all(p.startswith("##") for p in pieces[1:])


@settings(max_examples=200, deadline=None)
@given(word=st.text(alphabet="abcz", min_size=1, max_size=8))
def test_greedy_encode_unk_iff_out_of_alphabet(word):
    vocab = {ch for ch in "abc"} | {"##" + ch for ch in "abc"}
    pieces = wp.greedy_encode(word, vocab, 1)
    assert (pieces == [wp.UNK]) == ("z" in word)
