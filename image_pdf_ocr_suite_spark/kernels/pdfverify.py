"""Independent structural PDF reader — the verification side of the P2/P3
searchable-PDF sinks.

Reads a PDF the way a conforming consumer does (trailer → xref → object
offsets → dicts → streams-by-/Length), never the way the writer built it:
no imports from kernels/pdfsink.py, no assumptions about object order or
formatting beyond the PDF 1.4 spec.  Extracted facts:

- ``n_pages``: count of ``/Type /Page`` dictionaries (not the /Pages node,
  not the writer's own page counter);
- ``n_text_ops``: text-show (``Tj``) operators inside UNFILTERED content
  streams — one per rendered invisible-layer word, counting BOTH literal
  strings (``) Tj``; ``)`` is always escaped inside literals) AND
  Identity-H hex strings (``> Tj``; hex strings contain only hex digits,
  so ``>`` is unambiguous) — the latter are the CJK-layer words;
- ``invisible``: every content stream that shows text sets text render
  mode 3 (``3 Tr``, the reference's render_mode=3, ocr.py:507) before any
  Tj;
- ``extract_invisible_text``: the full text of the invisible layer,
  decoding WinAnsi literals directly and Identity-H hex strings through
  the Type0 font's /ToUnicode CMap (bfrange parse, ISO 32000 §9.10.3) —
  proving a Japanese word inserted by the sink round-trips to Unicode the
  way any conforming text extractor would read it.

This turns the binary PDF sink into a driver-checkable query: the parsed
facts have an independent golden (payload page count + the span-model
word list filtered to WinAnsi-encodable text — the sink's documented
per-word encode-skip), see goldens.py.
"""

from __future__ import annotations

import re


class PdfStructureError(ValueError):
    pass


def _xref_section(pdf: bytes, xref_at: int):
    """Parse ONE cross-reference section (possibly several subsections)
    at ``xref_at``: returns ``({obj_no: offset-or-None}, prev)`` where
    None marks a free entry (it shadows older definitions) and ``prev``
    is the trailer's ``/Prev`` pointer to the preceding section."""
    if pdf[xref_at:xref_at + 4] != b"xref":
        raise PdfStructureError("no xref table at startxref")
    pos = xref_at + 4
    entries: dict[int, int | None] = {}
    while True:
        sub = re.match(rb"\s*(\d+) (\d+)\s*\n", pdf[pos:])
        if not sub:
            break
        first, count = int(sub.group(1)), int(sub.group(2))
        pos += sub.end()
        for i in range(count):
            row = pdf[pos + i * 20: pos + (i + 1) * 20]
            if len(row) < 18:
                raise PdfStructureError("truncated xref row")
            try:
                off, _gen = int(row[:10]), int(row[11:16])
            except ValueError as exc:  # non-digit bytes in a declared row
                raise PdfStructureError(f"malformed xref row {first + i}") from exc
            entries[first + i] = off if row[17:18] == b"n" else None
        pos += count * 20
    tend = pdf.find(b"startxref", pos)
    scope = pdf[pos:tend if tend >= 0 else len(pdf)]
    prev = None
    if scope.lstrip().startswith(b"trailer"):
        pm = re.search(rb"/Prev\s+(\d+)", scope)
        if pm:
            prev = int(pm.group(1))
    return entries, prev


def _object_spans(pdf: bytes) -> list[tuple[int, int]]:
    """(start, end) byte ranges of every LIVE indirect object: start from
    the LAST startxref (the spec says a consumer reads from the end of
    the file) and follow the trailer ``/Prev`` chain through every
    earlier section, newest definition winning per object number — so an
    incrementally-updated PDF enumerates original AND updated objects,
    with superseded/freed revisions shadowed."""
    matches = list(re.finditer(rb"startxref\s+(\d+)\s+%%EOF", pdf))
    if not matches:
        raise PdfStructureError("no startxref")
    at: int | None = int(matches[-1].group(1))
    merged: dict[int, int | None] = {}
    visited: set[int] = set()
    while at is not None:
        if at in visited:
            raise PdfStructureError("xref /Prev cycle")
        visited.add(at)
        entries, at = _xref_section(pdf, at)
        for no, off in entries.items():
            merged.setdefault(no, off)   # newest section seen first wins
    spans = []
    for no, off in sorted(merged.items()):
        if no == 0 or off is None:
            continue
        end = pdf.find(b"endobj", off)
        if end < 0:
            raise PdfStructureError(f"object at {off} has no endobj")
        spans.append((off, end))
    return spans


def pdf_stats(pdf: bytes) -> dict:
    """Structural facts of one PDF: pages, text ops, invisibility."""
    if not pdf.startswith(b"%PDF-"):
        raise PdfStructureError("not a PDF")
    n_pages = 0
    n_text_ops = 0
    invisible = True
    any_text = False
    for start, end in _object_spans(pdf):
        body = pdf[start:end]
        stream_at = body.find(b"stream")
        head = body[: stream_at if stream_at >= 0 else len(body)]
        if re.search(rb"/Type\s*/Page[^s]", head):
            n_pages += 1
        if stream_at < 0:
            continue
        lm = re.search(rb"/Length\s+(\d+)", head)
        if not lm:
            raise PdfStructureError("stream without /Length")
        nl_at = body.find(b"\n", stream_at)
        if nl_at < 0:  # without this guard, find()+1 == 0 would silently
            raise PdfStructureError("no EOL after stream keyword")
        data = body[nl_at + 1: nl_at + 1 + int(lm.group(1))]
        if b"/Filter" in head:
            continue  # image XObject / CMap (Flate) — not a content stream
        ops = data.count(b") Tj") + data.count(b"> Tj")
        if ops:
            any_text = True
            n_text_ops += ops
            # render mode 3 must be set BEFORE the first text-show op —
            # '3 Tr' after a Tj means that word already rendered visibly
            tr = re.search(rb"\b3 Tr\b", data)
            firsts = [p for p in (data.find(b") Tj"), data.find(b"> Tj"))
                      if p >= 0]
            if not tr or tr.start() > min(firsts):
                invisible = False
    return {"n_pages": n_pages, "n_text_ops": n_text_ops,
            "invisible": invisible if any_text else True}


def _tounicode_ranges(pdf: bytes) -> list[tuple[int, int, int]]:
    """bfrange rows ``(lo, hi, dst_start)`` of the FIRST Type0 font's
    /ToUnicode CMap, inflating the stream if it carries /FlateDecode.
    Returns [] when the PDF has no Type0 font (ASCII-only documents)."""
    import zlib
    for start, end in _object_spans(pdf):
        body = pdf[start:end]
        if b"/Subtype /Type0" not in body and b"/Subtype/Type0" not in body:
            continue
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", body)
        if not tm:
            raise PdfStructureError("Type0 font without /ToUnicode")
        target = int(tm.group(1))
        # locate the CMap object by its number in the live-object set
        # (spans start at the "N G obj" header line)
        for s2, e2 in _object_spans(pdf):
            m3 = re.match(rb"(\d+)\s+\d+\s+obj", pdf[s2:s2 + 32])
            if not m3 or int(m3.group(1)) != target:
                continue
            cbody = pdf[s2:e2]
            sa = cbody.find(b"stream")
            if sa < 0:
                raise PdfStructureError("/ToUnicode is not a stream")
            lm = re.search(rb"/Length\s+(\d+)", cbody[:sa])
            nl = cbody.find(b"\n", sa)
            data = cbody[nl + 1: nl + 1 + int(lm.group(1))]
            if b"/FlateDecode" in cbody[:sa]:
                data = zlib.decompress(data)
            ranges = []
            for block in re.finditer(
                    rb"beginbfrange(.*?)endbfrange", data, re.S):
                for row in re.finditer(
                        rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
                        rb"<([0-9A-Fa-f]+)>", block.group(1)):
                    ranges.append((int(row.group(1), 16),
                                   int(row.group(2), 16),
                                   int(row.group(3), 16)))
            return ranges
    return []


def _unescape_literal(raw: bytes) -> str:
    """PDF literal string body -> text (WinAnsi/cp1252; the writer only
    escapes backslash and parens)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0x5C and i + 1 < len(raw):          # backslash escape
            out.append(raw[i + 1])
            i += 2
        else:
            out.append(b)
            i += 1
    return out.decode("cp1252")


def extract_invisible_text(pdf: bytes) -> list[str]:
    """Every text-show string of the invisible layer, in content-stream
    order: literal strings decoded as WinAnsi, hex strings decoded as
    2-byte CIDs mapped through the Type0 font's /ToUnicode bfranges —
    exactly how a conforming text extractor recovers the Japanese words
    the reference exists to make searchable (ocr.py:506)."""
    ranges = _tounicode_ranges(pdf)

    def cid_to_uni(cid: int) -> str:
        for lo, hi, dst in ranges:
            if lo <= cid <= hi:
                return chr(dst + (cid - lo))
        raise PdfStructureError(f"CID {cid} outside every bfrange")

    words: list[str] = []
    for start, end in _object_spans(pdf):
        body = pdf[start:end]
        stream_at = body.find(b"stream")
        if stream_at < 0 or b"/Filter" in body[:stream_at]:
            continue
        lm = re.search(rb"/Length\s+(\d+)", body[:stream_at])
        nl = body.find(b"\n", stream_at)
        data = body[nl + 1: nl + 1 + int(lm.group(1))]
        for m in re.finditer(
                rb"\(((?:[^()\\]|\\.)*)\) Tj|<([0-9A-Fa-f]*)> Tj", data):
            if m.group(1) is not None:
                words.append(_unescape_literal(m.group(1)))
            else:
                hx = m.group(2)
                cids = [int(hx[i:i + 4], 16) for i in range(0, len(hx), 4)]
                words.append("".join(cid_to_uni(c) for c in cids))
    return words


def searchable_pdf_stats(pdf_df, pdf_col: str = "pdf", url_col: str = "url"):
    """(url, pdf) -> (url, n_pages, n_text_ops) by structural parse —
    Arrow-batched; parse failures surface as a negative page count row
    rather than a task failure."""
    from collections.abc import Iterator

    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, raw in zip(pdf[url_col], pdf[pdf_col]):
                try:
                    st = pdf_stats(bytes(raw))
                    if not st["invisible"]:
                        raise PdfStructureError("visible text layer")
                    rows.append((url, st["n_pages"], st["n_text_ops"]))
                except PdfStructureError:
                    rows.append((url, -1, -1))
            if rows:
                yield pd.DataFrame(rows, columns=[url_col, "n_pages", "n_text_ops"])

    return pdf_df.select(url_col, pdf_col).mapInPandas(
        kernel, schema=f"{url_col} string, n_pages int, n_text_ops bigint")
