"""Independent structural PDF reader — the verification side of the P2/P3
searchable-PDF sinks.

Reads a PDF the way a conforming consumer does (trailer → xref → object
offsets → dicts → streams-by-/Length), never the way the writer built it:
no imports from kernels/pdfsink.py, no assumptions about object order or
formatting beyond the PDF 1.4 spec.  Extracted facts:

- ``n_pages``: count of ``/Type /Page`` dictionaries (not the /Pages node,
  not the writer's own page counter);
- ``n_text_ops``: text-show (``Tj``) operators inside UNFILTERED content
  streams — one per rendered invisible-layer word (the sink never splits
  or merges words; tokens are whitespace-split so ``) Tj`` cannot occur
  inside a string literal, where ``)`` is always escaped);
- ``invisible``: every content stream that shows text sets text render
  mode 3 (``3 Tr``, the reference's render_mode=3, ocr.py:507) before any
  Tj.

This turns the binary PDF sink into a driver-checkable query: the parsed
facts have an independent golden (payload page count + the span-model
word list filtered to WinAnsi-encodable text — the sink's documented
per-word encode-skip), see goldens.py.
"""

from __future__ import annotations

import re


class PdfStructureError(ValueError):
    pass


def _object_spans(pdf: bytes) -> list[tuple[int, int]]:
    """(start, end) byte ranges of every indirect object, via the xref
    table (trailer ``startxref`` → offsets), end = next ``endobj``."""
    # the LAST startxref governs (incremental updates append a new xref;
    # the spec says a consumer starts from the end of the file)
    matches = list(re.finditer(rb"startxref\s+(\d+)\s+%%EOF", pdf))
    if not matches:
        raise PdfStructureError("no startxref")
    xref_at = int(matches[-1].group(1))
    header = re.match(rb"xref\s+(\d+) (\d+)\s*\n", pdf[xref_at:])
    if not header:
        raise PdfStructureError("no xref table at startxref")
    first, count = int(header.group(1)), int(header.group(2))
    rows_at = xref_at + header.end()
    spans = []
    for i in range(count):
        row = pdf[rows_at + i * 20: rows_at + (i + 1) * 20]
        if len(row) < 18:
            raise PdfStructureError("truncated xref row")
        try:
            off, _gen = int(row[:10]), int(row[11:16])
        except ValueError as exc:  # non-digit bytes in a declared row
            raise PdfStructureError(f"malformed xref row {i}") from exc
        kind = row[17:18]
        if kind != b"n" or (first + i) == 0:
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
            continue  # image XObject (Flate) — not a content stream
        ops = data.count(b") Tj")
        if ops:
            any_text = True
            n_text_ops += ops
            # render mode 3 must be set BEFORE the first text-show op —
            # '3 Tr' after a Tj means that word already rendered visibly
            tr = re.search(rb"\b3 Tr\b", data)
            if not tr or tr.start() > data.find(b") Tj"):
                invisible = False
    return {"n_pages": n_pages, "n_text_ops": n_text_ops,
            "invisible": invisible if any_text else True}


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
