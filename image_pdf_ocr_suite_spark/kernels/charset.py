"""Charset detection + decode for Common-Crawl-style HTML payloads.

The north-rule input table carries ``html:binary`` — real web archives
are NOT uniformly UTF-8 (the reference suite's own domain, Japanese
pages, is the canonical case: Shift_JIS and EUC-JP remain common in
older crawls).  This kernel resolves an encoding per document with a
deterministic WHATWG-inspired ladder and decodes to text:

1. **BOM** — UTF-8 / UTF-16 LE / UTF-16 BE byte-order marks win
   outright (``source='bom'``).
2. **meta tag** — the first 1024 bytes are scanned (latin-1 view, so
   the scan itself never fails) for ``<meta charset=...>`` or the
   http-equiv Content-Type form; recognized labels are normalized via
   a small WHATWG-alias subset (``source='meta'``).  Labels that map
   to UTF-16 are treated as UTF-8 per the WHATWG rule (a meta tag
   readable in an ASCII superset cannot be honest about UTF-16).
3. **strict UTF-8 validation** of the whole payload
   (``source='valid-utf8'``).
4. **heuristic ladder** — strict ``shift_jis`` then strict ``euc_jp``
   over the whole payload, else ``latin-1`` which always succeeds
   (``source='heuristic'``).  The ladder order is fixed and
   documented: ambiguous inputs resolve deterministically.

Decoding then uses the resolved codec with ``errors='replace'`` so a
lying meta tag can never fail a task; ``had_replacement`` records
whether any U+FFFD was introduced.

Spark-side: one mapInPandas kernel (``decode_html``) emitting
``(id, text, encoding, charset_source, had_replacement)``; map-only,
no shuffle, Arrow-batched — the per-document Python work is a couple
of bytes scans, the same class of kernel as the WARC parser
(tableio/warc.py).

Reference scope note: the reference suite ingests PDFs, not HTML; this
layer is part of the task-mandated Common-Crawl source surface.
"""

from __future__ import annotations

import codecs
import re
from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame

# WHATWG alias subset -> python codec name (lowercased lookup).
_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "us-ascii": "utf-8", "ascii": "utf-8",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis", "ms_kanji": "shift_jis",
    "windows-31j": "cp932", "cp932": "cp932",
    "euc-jp": "euc_jp", "euc_jp": "euc_jp", "x-euc-jp": "euc_jp",
    "iso-2022-jp": "iso2022_jp", "csiso2022jp": "iso2022_jp",
    "latin-1": "latin-1", "latin1": "latin-1", "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1", "l1": "latin-1", "cp819": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252", "x-cp1252": "cp1252",
    "euc-kr": "euc_kr", "gbk": "gbk", "gb2312": "gbk", "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs",
    "koi8-r": "koi8_r", "windows-1251": "cp1251",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}

_META_RE = re.compile(
    r"""<meta[^>]+?charset\s*=\s*["']?\s*([a-zA-Z0-9_:.+-]+)""",
    re.IGNORECASE)

_HEURISTIC_LADDER = ("shift_jis", "euc_jp")


def _normalize_label(label: str) -> Optional[str]:
    return _ALIASES.get(label.strip().strip('"\'').lower())


def _strict_ok(data: bytes, codec: str) -> bool:
    try:
        data.decode(codec, errors="strict")
        return True
    except (UnicodeDecodeError, ValueError):
        return False


def detect_charset(data: bytes) -> Tuple[str, str]:
    """``(python_codec, source)`` for an HTML byte payload; source is
    one of ``bom | meta | valid-utf8 | heuristic``."""
    if data.startswith(codecs.BOM_UTF8):
        return "utf-8", "bom"
    if data.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le", "bom"
    if data.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be", "bom"
    head = data[:1024].decode("latin-1")
    m = _META_RE.search(head)
    if m:
        codec = _normalize_label(m.group(1))
        if codec is not None:
            # WHATWG: a meta label naming UTF-16 is read as UTF-8
            if codec.startswith("utf-16"):
                codec = "utf-8"
            return codec, "meta"
    if _strict_ok(data, "utf-8"):
        return "utf-8", "valid-utf8"
    for codec in _HEURISTIC_LADDER:
        if _strict_ok(data, codec):
            return codec, "heuristic"
    return "latin-1", "heuristic"


def decode_bytes(data: Optional[bytes]) -> Tuple[str, str, str, bool]:
    """``(text, encoding, source, had_replacement)``; None/empty input
    decodes to empty UTF-8 text."""
    if not data:
        return "", "utf-8", "valid-utf8", False
    codec, source = detect_charset(bytes(data))
    body = bytes(data)
    if source == "bom":         # strip the BOM from the text itself
        n = len(codecs.BOM_UTF8) if codec == "utf-8" else 2
        body = body[n:]
    text = body.decode(codec, errors="replace")
    return text, codec, source, "�" in text


def decode_html(df: DataFrame, html_col: str = "html",
                id_col: str = "doc_id") -> DataFrame:
    """``(id, text, encoding, charset_source, had_replacement)`` per
    input row.  Map-only Arrow kernel; no shuffle."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = [decode_bytes(raw) for raw in pdf[html_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "text": [t for t, _, _, _ in out],
                "encoding": [e for _, e, _, _ in out],
                "charset_source": [s for _, _, s, _ in out],
                "had_replacement": [r for _, _, _, r in out],
            })

    return df.select(id_col, html_col).mapInPandas(
        kernel,
        schema=(f"{id_col} {id_type}, text string, encoding string, "
                f"charset_source string, had_replacement boolean"))
