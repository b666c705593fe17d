"""Heading-path section chunking over HTML pages.

RAG and pretraining pipelines chunk documents at *section* boundaries
so every chunk carries its heading context ("Installation > Linux >
Requirements"), not just a flat window of tokens.  This kernel walks a
page's ``<h1>``-``<h6>`` outline once and emits one row per section:

``(url, sec_idx, level, heading, path, text, n_chars)``

Semantics (deliberately closed-form so the DuckDB oracle can restate
them; hostile-markup behavior pytest-pinned):

* a heading of level *L* closes the current section and replaces every
  open heading of level >= *L* on the outline stack (the HTML5 outline
  in its practical form);
* ``heading`` is the heading's whitespace-collapsed text; ``path`` is
  the " > "-joined open headings from the outermost down to and
  INCLUDING this one — the breadcrumb a chunk consumer prepends;
* ``text`` is the whitespace-collapsed character data between this
  heading and the next one (headings' own text excluded), ``n_chars``
  its length;
* content before the first heading forms a preamble section with
  ``level = 0``, NULL heading, empty path — emitted only when its
  text is non-empty;
* sections whose text is empty ARE emitted (a bare heading is real
  structure: consumers decide whether an empty section matters) except
  the preamble as above; ``sec_idx`` numbers emitted rows 0-based;
* ``<template>``/``<noscript>`` content and ``<script>``/``<style>``
  raw bodies never contribute (the shared inert/raw gates).

Scale: one map-only Arrow kernel over the column-pruned ``(url, html)``
scan — no shuffle at any corpus size (the html_tables/markdown shape:
embarrassingly parallel, the only cost is the Arrow boundary).
Reference anchor: the reference assembles page text under explicit
``--- ページ N ---`` section headers (/root/reference/image_pdf_ocr/
ocr.py:767) — the same text-under-heading discipline applied to the
DOM outline.
"""
from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_INERT = ("template", "noscript")
_RAW = ("script", "style")
_HEADINGS = {f"h{i}": i for i in range(1, 7)}


def _collapse(parts: list[str]) -> str:
    return " ".join("".join(parts).split())


class _SectionParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        # finished sections: (level, heading, path, text)
        self.sections: list[tuple] = []
        self._stack: list[tuple[int, str]] = []   # open (level, heading)
        self._cur_level = 0
        self._cur_heading: str | None = None
        self._cur_path = ""
        self._body: list[str] = []
        self._inert_depth = 0
        self._raw_depth = 0
        self._h_level = 0                          # inside <hN> when > 0
        self._h_parts: list[str] = []

    def _flush(self) -> None:
        text = _collapse(self._body)
        if self._cur_heading is not None or text:
            self.sections.append(
                (self._cur_level, self._cur_heading, self._cur_path, text))
        self._body = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _INERT:
            self._inert_depth += 1
            return
        if self._inert_depth:
            return
        if tag in _RAW:
            self._raw_depth += 1
            return
        lvl = _HEADINGS.get(tag)
        if lvl is not None and self._h_level == 0:
            self._flush()
            self._h_level = lvl
            self._h_parts = []

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
        lvl = _HEADINGS.get(tag)
        if lvl is not None and self._h_level == lvl:
            heading = _collapse(self._h_parts)
            while self._stack and self._stack[-1][0] >= lvl:
                self._stack.pop()
            self._stack.append((lvl, heading))
            self._cur_level = lvl
            self._cur_heading = heading
            self._cur_path = " > ".join(h for _, h in self._stack)
            self._h_level = 0
            self._h_parts = []

    def handle_data(self, data: str) -> None:
        if self._inert_depth or self._raw_depth:
            return
        if self._h_level:
            self._h_parts.append(data)
        else:
            self._body.append(data)

    def close(self) -> None:
        super().close()
        if self._h_level:
            # unclosed heading at EOF: its text joins a trailing
            # recovery section (the flush already ran at its start tag)
            self._body.extend(self._h_parts)
            self._h_level = 0
        self._flush()


def section_rows(html: str) -> list[tuple]:
    """``[(sec_idx, level, heading, path, text, n_chars), ...]`` for
    one page — the single spelling shared by the Spark kernel and the
    pytest reference.  Never raises on hostile markup."""
    p = _SectionParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        p.close()
    return [(i, lv, h, pa, tx, len(tx))
            for i, (lv, h, pa, tx) in enumerate(p.sections)]


SECTIONS_SCHEMA = ("url string, sec_idx int, level int, heading string, "
                   "path string, text string, n_chars int")


def sections_kernel(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from image_pdf_ocr_suite_spark.kernels.charset import decode_bytes

    for pdf in batches:
        urls: list[str] = []
        rows: list[tuple] = []
        for url, raw in zip(pdf["url"], pdf["html"]):
            for r in section_rows(decode_bytes(raw)[0]):
                urls.append(url)
                rows.append(r)
        yield pd.DataFrame({
            "url": pd.array(urls, dtype="string"),
            "sec_idx": pd.array([r[0] for r in rows], dtype="Int32"),
            "level": pd.array([r[1] for r in rows], dtype="Int32"),
            "heading": pd.array([r[2] for r in rows], dtype="string"),
            "path": pd.array([r[3] for r in rows], dtype="string"),
            "text": pd.array([r[4] for r in rows], dtype="string"),
            "n_chars": pd.array([r[5] for r in rows], dtype="Int32"),
        })


def section_chunks(page_df: DataFrame) -> DataFrame:
    """Pages table ``(url, html, ...)`` → one row per heading-path
    section.  Map-only Arrow kernel over a column-pruned scan;
    charset-aware.  No shuffle at any scale."""
    from image_pdf_ocr_suite_spark.partitioning import fan_out_small

    return fan_out_small(page_df.select("url", "html")).mapInPandas(
        sections_kernel, schema=SECTIONS_SCHEMA)
