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


def _xref(entries):
    """entries: list of (first, [(off, kind), ...]) subsections."""
    out = b"xref\n"
    for first, rows in entries:
        out += b"%d %d\n" % (first, len(rows))
        for off, kind in rows:
            out += b"%010d %05d %s \n" % (off, 65535 if kind == b"f" else 0, kind)
    return out


def test_pdfverify_follows_prev_chain():
    """Incrementally-updated PDF: the final xref section lists only the
    CHANGED objects; pages recorded solely in the original section must
    still be enumerated via the trailer /Prev chain."""
    from image_pdf_ocr_suite_spark.kernels import pdfverify

    body = b"%PDF-1.4\n"
    offs = {}
    objs1 = [
        (1, b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"),
        (2, b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"),
        (3, b"3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n"),
    ]
    for no, src in objs1:
        offs[no] = len(body)
        body += src
    xref1_at = len(body)
    body += _xref([(0, [(0, b"f")] + [(offs[n], b"n") for n in (1, 2, 3)])])
    body += (b"trailer\n<< /Size 4 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
             % xref1_at)
    # revision 2: update the /Pages node, append a second /Type /Page
    objs2 = [
        (2, b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>\nendobj\n"),
        (4, b"4 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n"),
    ]
    for no, src in objs2:
        offs[no] = len(body)
        body += src
    xref2_at = len(body)
    body += _xref([(2, [(offs[2], b"n")]), (4, [(offs[4], b"n")])])
    body += (b"trailer\n<< /Size 5 /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
             % (xref1_at, xref2_at))

    spans = pdfverify._object_spans(body)
    assert len(spans) == 4                       # objects 1-4, all live
    # the updated object 2 must resolve to its NEW offset
    assert (offs[2], body.find(b"endobj", offs[2])) in spans
    st = pdfverify.pdf_stats(body)
    assert st["n_pages"] == 2                    # page 3 via /Prev, page 4 new


def test_cjk_text_layer_roundtrips_through_tounicode():
    """Round 5: Japanese words — the reference's entire use case
    (ocr.py:244-355 resolves a CJK font precisely for this, inserts jpn
    text at ocr.py:506) — land in the invisible layer via a non-embedded
    Identity-H CIDFontType0 with a ToUnicode CMap, and round-trip through
    the INDEPENDENT structural parser the way any conforming text
    extractor reads them."""
    from image_pdf_ocr_suite_spark.kernels.pdfverify import (
        extract_invisible_text, pdf_stats)
    doc = Document(pages=[Page(200, 60, [
        Word(1, 1, 1, 1, 10, 12, 30, 10, 80.0, 0, "日本語"),
        Word(1, 1, 1, 2, 50, 12, 30, 10, 85.0, 0, "テスト"),
        Word(1, 1, 1, 3, 90, 12, 20, 10, 90.0, 0, "latin"),
        Word(1, 1, 1, 4, 120, 12, 20, 10, 90.0, 0, "café"),   # cp1252
        Word(1, 1, 1, 5, 150, 12, 20, 10, 90.0, 0, "\U0001F389"),  # non-BMP
    ])])
    pdf = build_searchable_pdf(spdf.encode(doc), CFG)
    st = pdf_stats(pdf)
    # 4 words render (the emoji is the documented non-BMP skip), all
    # invisible; two of them are CJK hex-string ops
    assert st["n_pages"] == 1
    assert st["n_text_ops"] == 4
    assert st["invisible"] is True
    words = extract_invisible_text(pdf)
    assert words == ["日本語", "テスト", "latin", "café"]
    # the CJK trio is present: Type0 + Identity-H + CIDFontType0 + CMap
    assert b"/Encoding /Identity-H" in pdf
    assert b"/Subtype /CIDFontType0" in pdf
    assert b"/ToUnicode" in pdf


def test_ascii_only_pdf_has_no_cjk_objects():
    """ASCII documents must not pay the CJK font/CMap bytes."""
    from image_pdf_ocr_suite_spark.kernels.pdfverify import (
        extract_invisible_text, pdf_stats)
    pdf = build_searchable_pdf(spdf.encode(_doc()), CFG)
    assert b"/Identity-H" not in pdf and b"/ToUnicode" not in pdf
    assert pdf_stats(pdf)["n_text_ops"] == 2
    assert extract_invisible_text(pdf) == ["visible", "second"]
