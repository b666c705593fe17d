"""Searchable-PDF sink (P2 parity): structurally valid PDF bytes with the
page raster embedded and an invisible (render-mode-3) text layer containing
exactly the conf>=50, non-empty words."""

import re
import zlib

import pytest

from image_pdf_ocr_suite_spark import fixtures, refmodel
from image_pdf_ocr_suite_spark import payload as spdf
from image_pdf_ocr_suite_spark.config import ExtractConfig
from image_pdf_ocr_suite_spark.kernels.pdfsink import build_searchable_pdf, emit_searchable_pdfs
from image_pdf_ocr_suite_spark.payload import Document, Page, Word

CFG = ExtractConfig()


def _doc():
    return Document(pages=[
        Page(100, 60, [Word(1, 1, 1, 1, 10, 12, 15, 10, 80.0, 0, "visible"),
                       Word(1, 1, 1, 2, 40, 12, 15, 10, 45.0, 0, "lowconf"),
                       Word(1, 1, 1, 3, 70, 12, 15, 10, 90.0, 0, None)]),
        Page(100, 40, [Word(1, 1, 1, 1, 10, 12, 15, 10, 75.0, 0, "second")]),
    ])


def _streams(pdf_bytes: bytes) -> list[bytes]:
    out = []
    for m in re.finditer(rb"(?<!end)stream\n", pdf_bytes):
        start = m.end()
        end = pdf_bytes.index(b"\nendstream", start)
        out.append(pdf_bytes[start:end])
    return out


def test_pdf_structure_and_text_layer():
    payload = spdf.encode(_doc())
    pdf = build_searchable_pdf(payload, CFG)
    assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")
    assert pdf.count(b"/Type /Page ") == 2
    assert b"/Count 2" in pdf

    streams = _streams(pdf)
    # content streams carry the invisible-text marker and the right words
    contents = b"\n".join(s for s in streams if b"BT 3 Tr" in s)
    assert b"(visible) Tj" in contents
    assert b"(second) Tj" in contents
    assert b"lowconf" not in contents          # conf 45 < 50 (ocr.py:33)

    # image XObjects decompress to the raster bytes
    img_streams = [s for s in streams if b"BT" not in s]
    raw = zlib.decompress(img_streams[0])
    assert len(raw) == 100 * 60 * 3            # W*H*RGB


def test_pdf_xref_offsets_are_valid():
    pdf = build_searchable_pdf(spdf.encode(_doc()), CFG)
    xref_at = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    assert pdf[xref_at:xref_at + 4] == b"xref"
    # every xref entry must point at "N 0 obj"
    table = pdf[xref_at:].split(b"trailer")[0].splitlines()[3:]
    for i, line in enumerate(table, start=1):
        off = int(line.split()[0])
        assert pdf[off:].startswith(f"{i} 0 obj".encode())


def test_emit_searchable_pdfs_dataframe(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(12)), "ja") for i in range(8)]
    df = spark.createDataFrame(fixtures.build_pages_pdf(rows))
    out = {r["url"]: r for r in emit_searchable_pdfs(df, CFG).collect()}
    # edge docs (empty id 5 -> 0 pages but still a PDF; no encrypted/corrupt <8)
    assert len(out) == 8
    for i in range(8):
        r = out[fixtures.url_for(i)]
        assert bytes(r["pdf"]).startswith(b"%PDF-1.4")
        exp_pages = len(fixtures.build_document(i, rows[i][1]).pages) \
            if i % fixtures.EDGE_MOD != fixtures.EMPTY_AT else 0
        assert r["n_pages"] == exp_pages
