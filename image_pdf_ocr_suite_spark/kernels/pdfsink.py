"""Searchable-PDF emission — parity with create_searchable_pdf
(/root/reference/image_pdf_ocr/ocr.py:436-533, pipeline P2).

A from-scratch, pure-Python PDF 1.4 writer (no PyMuPDF): per page it embeds
the raster as a FlateDecode RGB image XObject and overlays the conf>=50
words as an INVISIBLE text layer (``3 Tr`` = text render mode 3, the
reference's ``render_mode=3``, ocr.py:507) at baseline ``(x, y+h)`` with
``fontsize = h * 0.8`` (ocr.py:506).  The output is a real, viewable PDF.

Deviations from the reference, pinned deliberately:
- font is the built-in Helvetica (WinAnsi) instead of a resolved CJK font
  file (ocr.py:244-355): the sandbox has no font files to embed, and the
  text layer is invisible; production swaps in a CID font program shipped
  via spark.files (see artifacts.py).  Words whose text cannot be encoded
  in WinAnsi are skipped — mirroring the reference's per-word RuntimeError
  swallow (ocr.py:509-511).
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


def _page_content(img, words: pd.DataFrame, w_pt: float, h_pt: float) -> bytes:
    """Content stream: draw the raster full-page, then the invisible text.
    Vectorized filtering (trim-empty drop ocr.py:495-497, NaN coordinate
    guard ocr.py:152-165); per-word encode failures are skipped like the
    reference's RuntimeError swallow (ocr.py:509-511)."""
    ops = [f"q {w_pt:.2f} 0 0 {h_pt:.2f} 0 0 cm /Im0 Do Q".encode()]
    ops.append(b"BT 3 Tr /F1 1 Tf")  # render mode 3 = invisible (ocr.py:507)
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
                enc = _esc(text)
            except UnicodeEncodeError:
                continue  # ≈ per-word RuntimeError swallow (ocr.py:509-511)
            ops.append(f"{f_:.3f} 0 0 {f_:.3f} {xp:.2f} {yp:.2f} Tm".encode()
                       + b" (" + enc + b") Tj")
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


def assemble_pdf(bundles: list[tuple]) -> bytes:
    """Page bundles -> one PDF 1.4 byte string (shared by P2 and P3)."""
    objects: list[bytes] = []   # 1-based object bodies

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font_id = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                  b"/Encoding /WinAnsiEncoding >>")
    page_ids = []
    kids_placeholder = add(b"")  # pages node, filled later

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
            f"/Font << /F1 {font_id} 0 R >> >> "
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
