"""JSON-LD structured-data extraction from HTML pages.

Publishers embed schema.org metadata as ``<script
type="application/ld+json">`` blocks (articles, products, orgs,
breadcrumbs); crawl pipelines mine these for typed page facts that the
visible DOM states only loosely (publication dates, canonical names).
This kernel collects every such block, parses the JSON, and emits one
row per top-level item with a small typed field set:

``(url, blk_idx, item_idx, item_type, name, date_published, item_url,
err)``

* a block whose JSON is a single object yields one item; a JSON array
  or a ``@graph`` wrapper yields one item per element (one level — a
  nested ``@graph`` inside an element is not unwrapped);
* ``name`` falls back to ``headline`` (Article types state headline);
* non-string field values (rare but legal lists/objects) are treated
  as absent rather than coerced;
* a block that fails to parse emits exactly one row with ``err =
  'json'`` and NULL fields — malformed publisher JSON is a *signal*
  (quarantine discipline, the same contract as the payload decoder);
* a page with no JSON-LD block emits nothing.

The script content is collected verbatim from the parser's CDATA-mode
data events, gated on the same skip discipline as the main-text
extractor (a ``<script>`` inside ``<template>`` is inert markup —
kernels/html.py learned this the hard way, CLAUDE round-5k).

Scale: map-only Arrow kernel over the column-pruned ``(url, html)``
scan — no shuffle; JSON parse cost is bounded by block size, not page
size.  Reference anchor: the reference's HTML handling is the density
stripper (/root/reference/image_pdf_ocr/ocr.py HTML ingest path); the
structured-data sibling follows the same kernel shape.
"""
from __future__ import annotations

import json
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd

_LD_TYPE = "application/ld+json"
# Content inside these never renders; a script block inside them is
# inert markup, not page metadata (same gate as the main-text parser).
_INERT = ("template", "noscript")


class _JsonLdParser(HTMLParser):
    """Collect the raw text of every ``application/ld+json`` script
    block in document order.  HTMLParser delivers script bodies through
    ``handle_data`` in CDATA mode; ``convert_charrefs=False`` keeps the
    JSON bytes verbatim (entity references are not legal inside script
    CDATA anyway)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.blocks: list[str] = []
        self._in_ld = False
        self._parts: list[str] = []
        self._inert_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _INERT:
            self._inert_depth += 1
        if tag == "script" and self._inert_depth == 0:
            a = {k: (v or "") for k, v in attrs}
            if a.get("type", "").strip().lower() == _LD_TYPE:
                self._in_ld = True
                self._parts = []

    def handle_endtag(self, tag: str) -> None:
        if tag in _INERT and self._inert_depth > 0:
            self._inert_depth -= 1
        if tag == "script" and self._in_ld:
            self._in_ld = False
            self.blocks.append("".join(self._parts))

    def handle_data(self, data: str) -> None:
        if self._in_ld:
            self._parts.append(data)


def jsonld_blocks(html: str) -> list[str]:
    """Raw JSON-LD block texts in document order; malformed markup
    yields whatever parsed before the failure — never raises."""
    p = _JsonLdParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return p.blocks


def _field(obj: dict, key: str) -> str | None:
    v = obj.get(key)
    return v if isinstance(v, str) and v else None


def jsonld_items(html: str) -> list[tuple]:
    """``[(blk_idx, item_idx, item_type, name, date_published,
    item_url, err), ...]`` for one page — the single spelling shared by
    the Spark kernel and the pytest reference."""
    rows: list[tuple] = []
    for b, raw in enumerate(jsonld_blocks(html)):
        if not raw.strip():
            # a blank block (e.g. a self-closed <script/> that HTMLParser
            # opens and immediately closes) is absent content, not
            # corruption — no row; blk_idx keeps counting source blocks.
            continue
        try:
            data = json.loads(raw)
        except Exception:
            rows.append((b, 0, None, None, None, None, "json"))
            continue
        if isinstance(data, dict) and isinstance(data.get("@graph"), list):
            items = data["@graph"]
        elif isinstance(data, list):
            items = data
        else:
            items = [data]
        for i, it in enumerate(items):
            if not isinstance(it, dict):
                rows.append((b, i, None, None, None, None, "item"))
                continue
            t = it.get("@type")
            if isinstance(t, list):          # multi-typed: first wins
                t = t[0] if t and isinstance(t[0], str) else None
            rows.append((b, i,
                         t if isinstance(t, str) else None,
                         _field(it, "name") or _field(it, "headline"),
                         _field(it, "datePublished"),
                         _field(it, "url"),
                         None))
    return rows


JSONLD_SCHEMA = ("url string, blk_idx int, item_idx int, item_type string, "
                 "name string, date_published string, item_url string, "
                 "err string")


def jsonld_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from image_pdf_ocr_suite_spark.kernels.charset import decode_bytes

    for pdf in batches:
        rows = []
        for url, raw in zip(pdf["url"], pdf["html"]):
            for item in jsonld_items(decode_bytes(raw)[0]):
                rows.append((url,) + item)
        yield pd.DataFrame(rows, columns=["url", "blk_idx", "item_idx",
                                          "item_type", "name",
                                          "date_published", "item_url",
                                          "err"])


def extract_jsonld(page_df):
    """Pages table ``(url, html, ...)`` -> one row per JSON-LD item.
    Map-only Arrow kernel over a column-pruned scan; charset-aware."""
    from image_pdf_ocr_suite_spark.partitioning import fan_out_small

    return fan_out_small(page_df.select("url", "html")).mapInPandas(
        jsonld_kernel, schema=JSONLD_SCHEMA)
