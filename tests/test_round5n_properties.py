"""Property-based tests (hypothesis) for the round-5n kernels — each
parser checked differentially against an INDEPENDENT model over random
structures the deterministic driver synthesis never produces (no Spark
session needed):

- sections: render(random outline) → section_rows == a straight
  stack-replay model over the outline event list (random levels 1-6,
  random body/heading words incl. empty bodies and messy whitespace);
- microdata: render(random item tree) → microdata_rows == a recursive
  tree-walk model (random nesting, attr- vs text-valued props,
  multi-name itemprops, property-less items).
"""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from image_pdf_ocr_suite_spark.analytics import sections as S
from image_pdf_ocr_suite_spark.kernels import microdata as M

words = st.lists(
    st.text(alphabet="abxy7", min_size=1, max_size=4), max_size=4)
ws = st.sampled_from([" ", "  ", "\t", "\n ", ""])


# ---- sections ----------------------------------------------------------

# an outline = preamble words + list of (level, heading words, body words)
outlines = st.tuples(
    words,
    st.lists(st.tuples(st.integers(1, 6), words, words), max_size=6))


def _render_outline(pre, secs, pad) -> str:
    out = [pad.join(pre)]
    for lvl, head, body in secs:
        out.append(f"<h{lvl}>{pad.join(head)}</h{lvl}>")
        out.append(pad.join(body))
    return "<html><body>" + "".join(out) + "</body></html>"


def _collapse(tokens, pad) -> str:
    return " ".join(pad.join(tokens).split())


def _model_sections(pre, secs, pad) -> list[tuple]:
    rows = []
    pre_text = _collapse(pre, pad)
    if pre_text:
        rows.append((0, None, "", pre_text))
    stack: list[tuple[int, str]] = []
    for lvl, head, body in secs:
        heading = _collapse(head, pad)
        while stack and stack[-1][0] >= lvl:
            stack.pop()
        stack.append((lvl, heading))
        path = " > ".join(h for _, h in stack)
        rows.append((lvl, heading, path, _collapse(body, pad)))
    return [(i, lv, h, pa, tx, len(tx))
            for i, (lv, h, pa, tx) in enumerate(rows)]


@settings(max_examples=300, deadline=None)
@given(outline=outlines, pad=ws)
def test_sections_match_stack_replay_model(outline, pad):
    pre, secs = outline
    got = S.section_rows(_render_outline(pre, secs, pad))
    assert got == _model_sections(pre, secs, pad)


# ---- microdata ---------------------------------------------------------

# a node is either a text-valued prop, an attr-valued prop (meta), or a
# nested item (possibly property-less); items carry optional itemtype.
prop_names = st.lists(st.sampled_from(["p", "q", "rr"]),
                      min_size=1, max_size=2)
leaf_text = st.tuples(st.just("text"), prop_names, words)
leaf_attr = st.tuples(st.just("attr"), prop_names,
                      st.text(alphabet="abc/:0", max_size=6))
nodes = st.recursive(
    st.one_of(leaf_text, leaf_attr),
    lambda kids: st.tuples(
        st.just("item"),
        st.one_of(prop_names, st.none()),      # None = no itemprop
        st.one_of(st.text(alphabet="AB", min_size=1, max_size=2),
                  st.none()),                  # itemtype
        st.lists(kids, max_size=3)),
    max_leaves=8)
trees = st.lists(nodes, max_size=3)


def _render_node(node, out):
    kind = node[0]
    if kind == "text":
        _, names, body = node
        out.append(f'<span itemprop="{" ".join(names)}">'
                   f'{" ".join(body)}</span>')
    elif kind == "attr":
        _, names, val = node
        out.append(f'<meta itemprop="{" ".join(names)}" content="{val}">')
    else:
        _, names, itype, kids = node
        attrs = ["itemscope"]
        if names:
            attrs.append(f'itemprop="{" ".join(names)}"')
        if itype is not None:
            attrs.append(f'itemtype="{itype}"')
        out.append(f'<div {" ".join(attrs)}>')
        for kid in kids:
            _render_node(kid, out)
        out.append("</div>")


def _render_tree(tree) -> str:
    out = ["<html><body>"]
    for node in tree:
        _render_node(node, out)
    out.append("</body></html>")
    return "".join(out)


class _Model:
    """Independent recursive walk: document-order item numbering,
    per-item seq counters, props outside any item dropped."""

    def __init__(self):
        self.rows = []
        self.n_items = 0
        self.seq = {}

    def _emit(self, owner, itype, names, value, vsource, child):
        s = self.seq.get(owner, 0)
        for j, p in enumerate(names):
            self.rows.append((owner, itype, p, s + j, value, vsource,
                              child))
        self.seq[owner] = s + len(names)

    def walk(self, node, owner, owner_type):
        kind = node[0]
        if kind == "text":
            _, names, body = node
            if owner is not None:
                self._emit(owner, owner_type, names,
                           " ".join(" ".join(body).split()), "text", None)
        elif kind == "attr":
            _, names, val = node
            if owner is not None:
                self._emit(owner, owner_type, names, val, "attr", None)
        else:
            _, names, itype, kids = node
            idx = self.n_items
            self.n_items += 1
            if names and owner is not None:
                self._emit(owner, owner_type, names, None, "item", idx)
            for kid in kids:
                self.walk(kid, idx, itype)


@settings(max_examples=300, deadline=None)
@given(tree=trees)
def test_microdata_matches_tree_walk_model(tree):
    model = _Model()
    for node in tree:
        model.walk(node, None, None)
    got = M.microdata_rows(_render_tree(tree))
    assert got == sorted(model.rows, key=lambda r: (r[0], r[3]))
