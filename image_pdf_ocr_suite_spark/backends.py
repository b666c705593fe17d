"""Deterministic raster / OCR backends.

The sandbox has no Pillow, PyMuPDF, or tesseract binary, so the engine is
built against pluggable backend protocols; this module provides the
deterministic pure-Python/numpy binding used by both the single-process
reference model (refmodel.py) and the Spark kernels.  Because BOTH sides
share this exact code, the byte-identity invariant (same extracted text per
url, BASELINE.json north_rule) is meaningful and testable.

Semantics mirrored from /root/reference/image_pdf_ocr/ocr.py:

- ``rasterize``       ≈ page.get_pixmap(dpi=300) → PIL.Image   (ocr.py:482-484)
- ``preprocess``      ≈ _preprocess_for_ocr: L-grayscale → ×1.5 resize →
                        autocontrast → threshold-180 binarize   (ocr.py:135-149)
- ``ocr_boxes``       ≈ pytesseract.image_to_data(..., DATAFRAME) (ocr.py:82-87)
- ``ocr_text``        ≈ pytesseract.image_to_string(image, lang) (ocr.py:766)

Backend-defined details (where the real libraries' behavior is opaque, we
pin a deterministic rule shared by all consumers):

- resize is nearest-neighbor index mapping (stands in for LANCZOS);
- on an upscaled raster the OCR reports integer boxes ``round(coord*scale)``
  (real OCR reports integer pixel boxes on the image it sees);
- confidences come from the ground truth embedded in the payload
  (``conf_base`` on the base raster, ``conf_pre`` on the preprocessed one);
- ``ocr_text`` renders a word only if its confidence on THAT image is
  >= LEGIBILITY_FLOOR (30), so the adaptive winner choice (ocr.py:48-79) is
  observable in the final text; words join with " " per line, lines with
  "\\n" per paragraph/block, blocks with "\\n\\n", plus a trailing "\\n".
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from image_pdf_ocr_suite_spark.payload import Page, Word

LEGIBILITY_FLOOR = 30.0

TSV_COLUMNS = ["level", "page_num", "block_num", "par_num", "line_num",
               "word_num", "left", "top", "width", "height", "conf", "text"]


@dataclass
class FakeImage:
    """Stand-in for PIL.Image: a real numpy raster + the ground truth the
    deterministic OCR reads.  ``scale`` is the upscale factor applied to the
    raster (1.0 base, 1.5 after preprocessing)."""

    array: np.ndarray        # HxWx3 uint8 (RGB) or HxW uint8 (L)
    mode: str                # "RGB" | "L"
    page: Page               # ground truth
    preprocessed: bool = False
    scale: float = 1.0

    @property
    def width(self) -> int:
        return self.array.shape[1]

    @property
    def height(self) -> int:
        return self.array.shape[0]


def rasterize(page: Page) -> FakeImage:
    """Synthesize the 300-dpi page raster (E1, ocr.py:482-484): white canvas,
    each word box filled with the page ink level. Deterministic."""
    arr = np.full((page.height_px, page.width_px, 3), 255, dtype=np.uint8)
    for w in page.words:
        x0 = max(0, int(w.left)); y0 = max(0, int(w.top))
        x1 = min(page.width_px, int(w.left + w.width))
        y1 = min(page.height_px, int(w.top + w.height))
        if x1 > x0 and y1 > y0:
            arr[y0:y1, x0:x1, :] = page.ink
    return FakeImage(arr, "RGB", page, preprocessed=False, scale=1.0)


def to_grayscale(img: FakeImage) -> np.ndarray:
    """RGB -> L with the ITU-R 601 luma PIL uses for mode 'L'."""
    if img.mode == "L":
        return img.array
    a = img.array.astype(np.uint32)
    return ((a[..., 0] * 299 + a[..., 1] * 587 + a[..., 2] * 114) // 1000).astype(np.uint8)


def preprocess(img: FakeImage, upscale: float = 1.5, binarize_threshold: int = 180) -> tuple[FakeImage, float]:
    """E2 (_preprocess_for_ocr, ocr.py:135-149): grayscale -> ×upscale resize
    (nearest-neighbor; backend-defined LANCZOS stand-in) -> autocontrast
    (linear min/max stretch) -> binarize at >threshold -> {0,255}."""
    gray = to_grayscale(img)
    scale = upscale
    if scale != 1.0:
        new_w = int(gray.shape[1] * scale)   # int() truncation per ocr.py:141
        new_h = int(gray.shape[0] * scale)
        ys = (np.arange(new_h) / scale).astype(np.int64).clip(0, gray.shape[0] - 1)
        xs = (np.arange(new_w) / scale).astype(np.int64).clip(0, gray.shape[1] - 1)
        resized = gray[np.ix_(ys, xs)]
    else:
        resized = gray
    lo, hi = int(resized.min()), int(resized.max())
    if hi > lo:
        stretched = ((resized.astype(np.int32) - lo) * 255 // (hi - lo)).astype(np.uint8)
    else:
        stretched = resized
    binary = np.where(stretched > binarize_threshold, 255, 0).astype(np.uint8)
    return FakeImage(binary, "L", img.page, preprocessed=True, scale=img.scale * scale), scale


def words_rows(page: Page, preprocessed: bool, scale: float) -> list[tuple]:
    """Tesseract-TSV rows for one page as the deterministic OCR reports
    them (ocr.py:82-87 shape).  Includes the non-word structural rows (page
    and line rows, conf=-1, text NaN) that Tesseract emits, which exercise
    the conf>=0 validity filter (ocr.py:96-97)."""
    rows: list[tuple] = [(1, 1, 0, 0, 0, 0, 0.0, 0.0, float(page.width_px),
                          float(page.height_px), -1.0, None)]
    seen_lines: set[tuple[int, int, int]] = set()
    for w in sorted(page.words, key=lambda w: (w.block, w.par, w.line, w.word)):
        lk = (w.block, w.par, w.line)
        if lk not in seen_lines:
            seen_lines.add(lk)
            rows.append((4, 1, w.block, w.par, w.line, 0, 0.0, 0.0, 0.0, 0.0, -1.0, None))
        conf = w.conf_pre if preprocessed else w.conf_base
        rows.append((
            5, 1, w.block, w.par, w.line, w.word,
            float(round(w.left * scale)), float(round(w.top * scale)),
            float(round(w.width * scale)), float(round(w.height * scale)),
            float(conf), w.text,
        ))
    return rows


def page_words_frame(page: Page, preprocessed: bool, scale: float) -> pd.DataFrame:
    return pd.DataFrame(words_rows(page, preprocessed, scale), columns=TSV_COLUMNS)


def parse_langs(lang: str) -> tuple[str, ...]:
    """Tesseract multi-language syntax: '+'-separated three-letter codes
    ("jpn", "jpn+eng").  A production binding passes the string verbatim to
    the engine; the deterministic backend validates it and treats every
    script as in-model (ground truth carries the text), so adding languages
    never removes words — the same superset behavior real tesseract has."""
    parts = tuple(lang.split("+"))
    if not all(len(p) == 3 and p.isalpha() and p.islower() for p in parts):
        raise ValueError(f"invalid tesseract lang spec: {lang!r}")
    return parts


def ocr_boxes(img: FakeImage, lang: str = "jpn") -> pd.DataFrame:
    """≈ pytesseract.image_to_data(img, lang=..., output_type=DATAFRAME)
    (ocr.py:82-87).  The deterministic backend reads ground truth, so
    ``lang`` selects the model in production bindings only ("jpn" default
    per the reference; "jpn+eng" per the north_star)."""
    parse_langs(lang)
    return page_words_frame(img.page, img.preprocessed, img.scale)


def normalize_for_canvas(img: FakeImage, target_width: int, target_height: int) -> FakeImage:
    """E5 (_normalize_image_for_canvas, ocr.py:561-593): fit-preserving
    scale ``min(tw/w, th/h)``, resize (nearest-neighbor stand-in for
    LANCZOS), center-paste on a white (tw, th) canvas.  EXIF transpose is a
    no-op for the synthetic raster (no orientation metadata).  Rounding
    mirrors the reference: ``max(1, int(round(dim * scale)))``; offsets
    ``max((target - new) // 2, 0)``.  Ground-truth word boxes are scaled
    and shifted the same way so the OCR backend stays consistent."""
    arr = img.array if img.mode == "RGB" else np.stack([img.array] * 3, axis=-1)
    h, w = arr.shape[0], arr.shape[1]
    if w <= 0 or h <= 0:
        canvas = np.full((target_height, target_width, 3), 255, dtype=np.uint8)
        return FakeImage(canvas, "RGB", Page(target_width, target_height, []), False, 1.0)
    scale = min(target_width / w, target_height / h)
    if scale <= 0:
        scale = 1.0
    new_w = max(1, int(round(w * scale)))
    new_h = max(1, int(round(h * scale)))
    if (new_w, new_h) != (w, h):
        ys = (np.arange(new_h) / (new_h / h)).astype(np.int64).clip(0, h - 1)
        xs = (np.arange(new_w) / (new_w / w)).astype(np.int64).clip(0, w - 1)
        resized = arr[np.ix_(ys, xs)]
    else:
        resized = arr
    canvas = np.full((target_height, target_width, 3), 255, dtype=np.uint8)
    off_x = max((target_width - new_w) // 2, 0)
    off_y = max((target_height - new_h) // 2, 0)
    canvas[off_y:off_y + new_h, off_x:off_x + new_w] = resized
    words = [
        Word(wd.block, wd.par, wd.line, wd.word,
             wd.left * scale + off_x, wd.top * scale + off_y,
             wd.width * scale, wd.height * scale,
             wd.conf_base, wd.conf_pre, wd.text)
        for wd in img.page.words
    ]
    page = Page(target_width, target_height, words, img.page.ink)
    return FakeImage(canvas, "RGB", page, False, 1.0)


def ocr_text(img: FakeImage, lang: str = "jpn") -> str:
    """≈ pytesseract.image_to_string(img, lang=...) — runs on the adaptive
    WINNER image (ocr.py:766), a second engine call separate from the box
    frame.  Words below LEGIBILITY_FLOOR confidence on this image are
    dropped; join words " ", lines "\\n", blocks "\\n\\n"; trailing "\\n"."""
    parse_langs(lang)
    words = sorted(img.page.words, key=lambda w: (w.block, w.par, w.line, w.word))
    blocks: dict[int, dict[tuple[int, int], list[str]]] = {}
    for w in words:
        conf = w.conf_pre if img.preprocessed else w.conf_base
        if w.text is None or conf < LEGIBILITY_FLOOR:
            continue
        blocks.setdefault(w.block, {}).setdefault((w.par, w.line), []).append(w.text)
    block_texts = []
    for b in sorted(blocks):
        lines = blocks[b]
        block_texts.append("\n".join(" ".join(lines[k]) for k in sorted(lines)))
    return "\n\n".join(block_texts) + "\n"
