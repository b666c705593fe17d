"""HTML5 microdata extraction (itemscope / itemtype / itemprop).

Microdata is the other major structured-data vocabulary next to JSON-LD
(kernels/jsonld.py): schema.org facts embedded as element attributes
rather than script blocks.  Large-crawl pipelines (Web Data Commons
style) mine both; this kernel walks the DOM once and emits one row per
*property*:

``(url, item_idx, item_type, prop, prop_seq, value, vsource, child_idx)``

Semantics (HTML microdata model, simplified to the subset a SQL oracle
can restate closed-form; hostile-markup behavior pytest-pinned):

* an element with ``itemscope`` opens an item; ``item_idx`` numbers
  itemscope starts in document order (0-based); ``item_type`` is the
  first whitespace-separated token of ``itemtype`` (NULL if absent);
* ``itemprop`` on an element WITHOUT ``itemscope`` yields one row per
  whitespace-separated property name, attached to the INNERMOST open
  item; the value source follows the spec's element table:
  ``meta`` → ``content`` attr, ``a``/``link``/``area`` → ``href``,
  ``img``/``audio``/``video``/``source``/``iframe``/``embed`` →
  ``src``, ``time`` → ``datetime`` attr when present,
  ``data`` → ``value`` attr when present (``vsource = 'attr'`` ONLY
  when the attribute is present — an absent datetime/value falls back
  to the element's descendant text with ``vsource = 'text'``); any
  other element → its descendant text, whitespace-collapsed
  ``" ".join(s.split())`` (``vsource = 'text'``);
* ``itemprop`` + ``itemscope`` on the SAME element: the nested item is
  the value — one row per property name with ``value`` NULL,
  ``vsource = 'item'`` and ``child_idx`` = the nested item's index;
* ``prop_seq`` numbers property rows within each item in document
  order (0-based) so repeated properties stay distinct under the
  driver's order-insensitive hash;
* properties outside any open item are ignored (top-level itemprop
  without itemref support — itemref is out of scope and its presence
  does not alter extraction);
* content inside ``<template>``/``<noscript>`` never renders and is
  ignored entirely (same inert gate as the main-text and JSON-LD
  parsers — kernels/html.py learned this the hard way); ``<script>``/
  ``<style>`` raw bodies never contribute to text values.

Scale: one map-only Arrow kernel over the column-pruned ``(url, html)``
scan — no shuffle at any corpus size; per-page work is linear in the
markup.  Reference anchor: the reference's HTML ingest is the density
stripper (/root/reference/image_pdf_ocr/ocr.py HTML path); this is its
structured-data sibling, same kernel shape as kernels/jsonld.py.
"""
from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional

import pandas as pd

_INERT = ("template", "noscript")
_RAW = ("script", "style")
# spec's attribute-valued elements: tag -> (attr, fallback_to_text)
_ATTR_VALUE = {
    "meta": ("content", False),
    "a": ("href", False), "link": ("href", False), "area": ("href", False),
    "img": ("src", False), "audio": ("src", False), "video": ("src", False),
    "source": ("src", False), "iframe": ("src", False),
    "embed": ("src", False),
    "time": ("datetime", True), "data": ("value", True),
}
# void elements never get an endtag from HTMLParser; they cannot carry
# text values or open items that contain children.
_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input",
         "link", "meta", "param", "source", "track", "wbr"}


class _Collector:
    """An in-flight text-valued property: collects descendant character
    data until its element's matching end tag (depth-counted)."""

    __slots__ = ("tag", "depth", "parts", "item_idx", "props", "seq0")

    def __init__(self, tag: str, item_idx: int, props: list[str],
                 seq0: int) -> None:
        self.tag = tag
        self.depth = 1
        self.parts: list[str] = []
        self.item_idx = item_idx
        self.props = props
        self.seq0 = seq0


class _MicrodataParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        # rows: (item_idx, item_type, prop, prop_seq, value, vsource,
        #        child_idx)
        self.rows: list[tuple] = []
        self._items: list[int] = []        # stack of open item_idx
        self._item_type: dict[int, Optional[str]] = {}
        self._n_items = 0
        self._seq: dict[int, int] = {}     # per-item prop_seq counter
        # parallel stack of (tag, opened_item: bool) for non-void tags
        self._tags: list[tuple[str, bool]] = []
        self._collectors: list[_Collector] = []
        self._inert_depth = 0
        self._raw_depth = 0

    # -- helpers ---------------------------------------------------
    def _next_seq(self, item_idx: int, n: int) -> int:
        s = self._seq.get(item_idx, 0)
        self._seq[item_idx] = s + n
        return s

    def _emit(self, item_idx: int, props: list[str], seq0: int,
              value: Optional[str], vsource: str,
              child_idx: Optional[int]) -> None:
        it = self._item_type.get(item_idx)
        for j, p in enumerate(props):
            self.rows.append((item_idx, it, p, seq0 + j, value, vsource,
                              child_idx))

    # -- parser events ---------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _INERT:
            self._inert_depth += 1
            return
        if self._inert_depth:
            return
        if tag in _RAW:
            self._raw_depth += 1
            return
        a = {}
        for k, v in attrs:
            a.setdefault(k, v if v is not None else "")
        # same-named nested tags bump in-flight text collectors
        for c in self._collectors:
            if c.tag == tag and tag not in _VOID:
                c.depth += 1
        has_scope = "itemscope" in a
        props = (a.get("itemprop") or "").split()
        owner = self._items[-1] if self._items else None
        child: Optional[int] = None
        if has_scope:
            child = self._n_items
            self._n_items += 1
            t = (a.get("itemtype") or "").split()
            self._item_type[child] = t[0] if t else None
        if props and owner is not None:
            seq0 = self._next_seq(owner, len(props))
            if has_scope:
                self._emit(owner, props, seq0, None, "item", child)
            else:
                spec = _ATTR_VALUE.get(tag)
                if spec is not None and (not spec[1] or spec[0] in a):
                    self._emit(owner, props, seq0, a.get(spec[0], ""),
                               "attr", None)
                elif tag in _VOID:
                    self._emit(owner, props, seq0, "", "text", None)
                else:
                    self._collectors.append(
                        _Collector(tag, owner, props, seq0))
        if tag not in _VOID:
            self._tags.append((tag, has_scope))
            if has_scope:
                self._items.append(child)  # type: ignore[arg-type]

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <x/> opens nothing: attr-valued props still fire, text-valued
        # props yield an empty value, itemscope opens an empty item.
        if tag in _INERT or self._inert_depth or tag in _RAW:
            if tag in _INERT and not self._inert_depth:
                pass  # <template/> contains nothing; no state change
            return
        a = {}
        for k, v in attrs:
            a.setdefault(k, v if v is not None else "")
        has_scope = "itemscope" in a
        props = (a.get("itemprop") or "").split()
        owner = self._items[-1] if self._items else None
        child: Optional[int] = None
        if has_scope:
            child = self._n_items
            self._n_items += 1
            t = (a.get("itemtype") or "").split()
            self._item_type[child] = t[0] if t else None
        if props and owner is not None:
            seq0 = self._next_seq(owner, len(props))
            if has_scope:
                self._emit(owner, props, seq0, None, "item", child)
            else:
                spec = _ATTR_VALUE.get(tag)
                if spec is not None and (not spec[1] or spec[0] in a):
                    self._emit(owner, props, seq0, a.get(spec[0], ""),
                               "attr", None)
                else:
                    self._emit(owner, props, seq0, "", "text", None)

    def handle_endtag(self, tag: str) -> None:
        if tag in _INERT:
            if self._inert_depth:
                self._inert_depth -= 1
            return
        if self._inert_depth:
            return
        if tag in _RAW:
            if self._raw_depth:
                self._raw_depth -= 1
            return
        # close the nearest matching open tag (HTML recovery: unmatched
        # end tags are ignored; intervening unclosed tags are popped)
        for i in range(len(self._tags) - 1, -1, -1):
            if self._tags[i][0] == tag:
                for t, scoped in reversed(self._tags[i:]):
                    if scoped and self._items:
                        self._items.pop()
                del self._tags[i:]
                break
        else:
            return
        done = []
        for c in self._collectors:
            if c.tag == tag:
                c.depth -= 1
                if c.depth == 0:
                    done.append(c)
        for c in done:
            self._collectors.remove(c)
            self._emit(c.item_idx, c.props, c.seq0,
                       " ".join("".join(c.parts).split()), "text", None)

    def handle_data(self, data: str) -> None:
        if self._inert_depth or self._raw_depth:
            return
        for c in self._collectors:
            c.parts.append(data)

    def close(self) -> None:  # flush unclosed text collectors
        super().close()
        for c in self._collectors:
            self._emit(c.item_idx, c.props, c.seq0,
                       " ".join("".join(c.parts).split()), "text", None)
        self._collectors = []


def microdata_rows(html: str) -> list[tuple]:
    """``[(item_idx, item_type, prop, prop_seq, value, vsource,
    child_idx), ...]`` for one page — the single spelling shared by the
    Spark kernel and the pytest reference.  Never raises on hostile
    markup; whatever parsed before a failure is kept."""
    p = _MicrodataParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return sorted(p.rows, key=lambda r: (r[0], r[3]))


MICRODATA_SCHEMA = ("url string, item_idx int, item_type string, "
                    "prop string, prop_seq int, value string, "
                    "vsource string, child_idx int")


def microdata_kernel(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from image_pdf_ocr_suite_spark.kernels.charset import decode_bytes

    for pdf in batches:
        urls: list[str] = []
        rows: list[tuple] = []
        for url, raw in zip(pdf["url"], pdf["html"]):
            for r in microdata_rows(decode_bytes(raw)[0]):
                urls.append(url)
                rows.append(r)
        yield pd.DataFrame({
            "url": pd.array(urls, dtype="string"),
            "item_idx": pd.array([r[0] for r in rows], dtype="Int32"),
            "item_type": pd.array([r[1] for r in rows], dtype="string"),
            "prop": pd.array([r[2] for r in rows], dtype="string"),
            "prop_seq": pd.array([r[3] for r in rows], dtype="Int32"),
            "value": pd.array([r[4] for r in rows], dtype="string"),
            "vsource": pd.array([r[5] for r in rows], dtype="string"),
            "child_idx": pd.array([r[6] for r in rows], dtype="Int32"),
        })


def extract_microdata(page_df):
    """Pages table ``(url, html, ...)`` → one row per microdata
    property.  Map-only Arrow kernel over a column-pruned scan;
    charset-aware.  No shuffle at any scale."""
    from image_pdf_ocr_suite_spark.partitioning import fan_out_small

    return fan_out_small(page_df.select("url", "html")).mapInPandas(
        microdata_kernel, schema=MICRODATA_SCHEMA)
