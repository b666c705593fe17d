"""Searchable-PDF emission — parity with create_searchable_pdf
(/root/reference/image_pdf_ocr/ocr.py:436-533, pipeline P2).

A from-scratch, pure-Python PDF 1.4 writer (no PyMuPDF): per page it embeds
the raster as a FlateDecode RGB image XObject and overlays the conf>=50
words as an INVISIBLE text layer (``3 Tr`` = text render mode 3, the
reference's ``render_mode=3``, ocr.py:507) at baseline ``(x, y+h)`` with
``fontsize = h * 0.8`` (ocr.py:506).  The output is a real, viewable PDF.

Fonts (round 5 — the reference's core capability is JAPANESE searchable
PDFs; it resolves a CJK font via env vars + OS font dirs precisely for
this, ocr.py:244-355, and inserts jpn text at ocr.py:506):
- /F1: built-in Helvetica (WinAnsi) for cp1252-encodable words;
- /F2: a non-embedded CIDFontType0 with /Encoding /Identity-H and a
  /ToUnicode CMap for everything else (CJK and any other BMP text).
  Because the layer is invisible (``3 Tr``) no glyph program is ever
  painted, so the font needs NO embedded font file — the CID of each
  character is its Unicode code point and the ToUnicode CMap is the
  identity over the BMP, which is exactly what a text extractor reads.
  Pure PDF 1.4 spec work (ISO 32000 §9.7, §9.10.3).

Deviations from the reference, pinned deliberately:
- words containing non-BMP characters (code points > U+FFFF, e.g. emoji
  or CJK extension B) are skipped — mirroring the reference's per-word
  RuntimeError swallow (ocr.py:509-511); Tesseract jpn output is BMP.
- PDF coordinates are bottom-up; boxes are flipped (y_pdf = H - y - h).

Spark mapping: a kernel stage producing a ``pdf:binary`` column — an
optional sink off the same winner-frame data the span path uses.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from image_pdf_ocr_suite_spark import backends
from image_pdf_ocr_suite_spark import payload as spdf
from image_pdf_ocr_suite_spark.config import ExtractConfig
from image_pdf_ocr_suite_spark.refmodel import (
    filter_frame_by_confidence,
    perform_adaptive_ocr,
)

PT_PER_PX = 72.0 / 300.0  # image-page coordinate scale (ocr.py:667-677)


def _esc(s: str) -> bytes:
    return s.encode("cp1252").replace(b"\\", b"\\\\") \
        .replace(b"(", b"\\(").replace(b")", b"\\)")


def _cid_hex(s: str) -> bytes:
    """Identity-H string for the CJK layer: each BMP character's CID is
    its Unicode code point, written as a 2-byte hex string.  Raises for
    non-BMP input (documented per-word skip)."""
    if any(ord(c) > 0xFFFF for c in s):
        raise UnicodeEncodeError("identity-h", s, 0, len(s),
                                 "non-BMP code point")
    return "".join(f"{ord(c):04X}" for c in s).encode("ascii")


def _page_content(img, words: pd.DataFrame, w_pt: float, h_pt: float) -> bytes:
    """Content stream: draw the raster full-page, then the invisible text.
    Vectorized filtering (trim-empty drop ocr.py:495-497, NaN coordinate
    guard ocr.py:152-165).  cp1252-encodable words use /F1 (WinAnsi
    literal strings); all other BMP words — the reference's Japanese use
    case — use /F2 (Identity-H hex strings, CID = code point); only
    non-BMP words are skipped like the reference's per-word RuntimeError
    swallow (ocr.py:509-511)."""
    ops = [f"q {w_pt:.2f} 0 0 {h_pt:.2f} 0 0 cm /Im0 Do Q".encode()]
    ops.append(b"BT 3 Tr /F1 1 Tf")  # render mode 3 = invisible (ocr.py:507)
    cur_font = b"F1"
    if len(words):
        t = words["text"].astype(str).str.strip()
        x = pd.to_numeric(words["left"], errors="coerce")
        y = pd.to_numeric(words["top"], errors="coerce")
        h = pd.to_numeric(words["height"], errors="coerce")
        keep = (t != "") & x.notna() & y.notna() & h.notna()
        fs = (h * 0.8 * PT_PER_PX)[keep]
        x_pt = (x * PT_PER_PX)[keep]
        y_pt = (h_pt - (y + h) * PT_PER_PX)[keep]  # baseline (x, y+h), flipped
        for text, f_, xp, yp in zip(t[keep], fs, x_pt, y_pt):
            try:
                show = b"(" + _esc(text) + b") Tj"
                font = b"F1"
            except UnicodeEncodeError:
                try:
                    show = b"<" + _cid_hex(text) + b"> Tj"
                    font = b"F2"
                except UnicodeEncodeError:
                    continue  # non-BMP: per-word swallow (ocr.py:509-511)
            if font != cur_font:
                ops.append(b"/" + font + b" 1 Tf")
                cur_font = font
            ops.append(f"{f_:.3f} 0 0 {f_:.3f} {xp:.2f} {yp:.2f} Tm".encode()
                       + b" " + show)
    ops.append(b"ET")
    return b"\n".join(ops)


def build_searchable_pdf(payload_bytes: bytes, cfg: ExtractConfig | None = None) -> bytes:
    """SPDF payload -> searchable PDF bytes (image + invisible text layer)."""
    cfg = cfg or ExtractConfig()
    doc = spdf.decode(payload_bytes)
    return assemble_pdf([ocr_page_bundle(backends.rasterize(p), cfg) for p in doc.pages])


def ocr_page_bundle(img: backends.FakeImage, cfg: ExtractConfig) -> tuple:
    """One page's PDF ingredients: (width_px, height_px, flate_imgdata,
    content_stream).  Runs adaptive OCR + conf>=50 filter on the raster."""
    result = perform_adaptive_ocr(img, cfg)
    filtered = filter_frame_by_confidence(result.frame, cfg.render_conf_threshold)
    filtered = filtered[filtered["level"] == 5]
    w_px, h_px = img.width, img.height
    w_pt, h_pt = w_px * PT_PER_PX, h_px * PT_PER_PX
    arr = img.array if img.mode == "RGB" else np.stack([img.array] * 3, axis=-1)
    imgdata = zlib.compress(arr.tobytes(), 6)
    content = _page_content(img, filtered, w_pt, h_pt)
    return (w_px, h_px, imgdata, content)


def _identity_bmp_cmap() -> bytes:
    """ToUnicode CMap mapping every 2-byte CID to the SAME Unicode code
    point (ISO 32000 §9.10.3).  bfrange rows may not cross a low-byte
    boundary, so the BMP takes 256 rows of <XX00> <XXFF> <XX00>, chunked
    into blocks of <=100 ranges as the CMap spec requires.  Content-
    independent, so built once and shared by every PDF."""
    lines = [b"/CIDInit /ProcSet findresource begin",
             b"12 dict begin", b"begincmap",
             b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) "
             b"/Supplement 0 >> def",
             b"/CMapName /Adobe-Identity-UCS def", b"/CMapType 2 def",
             b"1 begincodespacerange", b"<0000> <FFFF>",
             b"endcodespacerange"]
    rows = [b"<%02X00> <%02XFF> <%02X00>" % (hi, hi, hi)
            for hi in range(256)]
    for at in range(0, 256, 100):
        chunk = rows[at:at + 100]
        lines.append(b"%d beginbfrange" % len(chunk))
        lines.extend(chunk)
        lines.append(b"endbfrange")
    lines += [b"endcmap",
              b"CMapName currentdict /CMap defineresource pop",
              b"end", b"end"]
    return b"\n".join(lines)


_CMAP_FLATE = zlib.compress(_identity_bmp_cmap(), 9)


def assemble_pdf(bundles: list[tuple]) -> bytes:
    """Page bundles -> one PDF 1.4 byte string (shared by P2 and P3).

    The CJK font trio (Type0 + CIDFontType0 descendant + ToUnicode CMap)
    is emitted only when some page actually shows an /F2 string, so
    ASCII-only documents pay zero extra bytes."""
    objects: list[bytes] = []   # 1-based object bodies

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font_id = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                  b"/Encoding /WinAnsiEncoding >>")
    needs_cjk = any(b"/F2 " in content for _, _, _, content in bundles)
    cjk_id = None
    if needs_cjk:
        # Non-embedded CID font: render mode 3 never paints glyphs, so no
        # font program is required — extractors read /ToUnicode (identity
        # over the BMP; CID = code point, ISO 32000 §9.7.4, §9.10.3).
        cmap_id = add(b"<< /Filter /FlateDecode /Length %d >>\nstream\n"
                      % len(_CMAP_FLATE) + _CMAP_FLATE + b"\nendstream")
        desc_id = add(b"<< /Type /FontDescriptor /FontName /NotoSansCJK "
                      b"/Flags 4 /FontBBox [0 -150 1000 850] "
                      b"/ItalicAngle 0 /Ascent 850 /Descent -150 "
                      b"/CapHeight 700 /StemV 80 >>")
        cidfont_id = add(b"<< /Type /Font /Subtype /CIDFontType0 "
                         b"/BaseFont /NotoSansCJK /CIDSystemInfo "
                         b"<< /Registry (Adobe) /Ordering (Identity) "
                         b"/Supplement 0 >> /FontDescriptor %d 0 R "
                         b"/DW 1000 >>" % desc_id)
        cjk_id = add(b"<< /Type /Font /Subtype /Type0 "
                     b"/BaseFont /NotoSansCJK /Encoding /Identity-H "
                     b"/DescendantFonts [%d 0 R] /ToUnicode %d 0 R >>"
                     % (cidfont_id, cmap_id))
    page_ids = []
    kids_placeholder = add(b"")  # pages node, filled later

    font_res = f"/F1 {font_id} 0 R"
    if cjk_id is not None:
        font_res += f" /F2 {cjk_id} 0 R"

    for w_px, h_px, imgdata, content in bundles:
        w_pt, h_pt = w_px * PT_PER_PX, h_px * PT_PER_PX
        im_id = add(
            f"<< /Type /XObject /Subtype /Image /Width {w_px} "
            f"/Height {h_px} /ColorSpace /DeviceRGB "
            f"/BitsPerComponent 8 /Filter /FlateDecode "
            f"/Length {len(imgdata)} >>\nstream\n".encode()
            + imgdata + b"\nendstream")
        ct_id = add(f"<< /Length {len(content)} >>\nstream\n".encode()
                    + content + b"\nendstream")
        pg_id = add(
            f"<< /Type /Page /Parent {kids_placeholder} 0 R "
            f"/MediaBox [0 0 {w_pt:.2f} {h_pt:.2f}] "
            f"/Resources << /XObject << /Im0 {im_id} 0 R >> "
            f"/Font << {font_res} >> >> "
            f"/Contents {ct_id} 0 R >>".encode())
        page_ids.append(pg_id)

    kids = " ".join(f"{i} 0 R" for i in page_ids)
    objects[kids_placeholder - 1] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>".encode())
    cat_id = add(f"<< /Type /Catalog /Pages {kids_placeholder} 0 R >>".encode())

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objects) + 1} /Root {cat_id} 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


PDF_SCHEMA = "url string, pdf binary, n_pages int"


def make_pdf_kernel(cfg: ExtractConfig):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, raw in zip(pdf["url"], pdf["html"]):
                if raw is None:
                    continue  # null payload: skip, never a task failure
                raw = bytes(raw)
                if spdf.sniff(raw) != "spdf" or (len(raw) > 5 and raw[5] & spdf.FLAG_ENCRYPTED):
                    continue
                try:
                    doc = spdf.decode(raw)
                except spdf.PayloadError:
                    continue
                rows.append((url, build_searchable_pdf(raw, cfg), len(doc.pages)))
            if rows:
                yield pd.DataFrame(rows, columns=["url", "pdf", "n_pages"])
    return kernel


def emit_searchable_pdfs(df, cfg: ExtractConfig | None = None):
    """(url, html) -> (url, pdf:binary, n_pages) — optional P2 sink."""
    cfg = cfg or ExtractConfig()
    return df.select("url", "html").mapInPandas(make_pdf_kernel(cfg), schema=PDF_SCHEMA)
