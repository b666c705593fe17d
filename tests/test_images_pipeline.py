"""P3 parity: images -> one searchable PDF per group, on a shared
max-extent canvas (E5 normalize), with the invisible text layer."""

import re
import zlib

import numpy as np
import pytest

from image_pdf_ocr_suite_spark import backends
from image_pdf_ocr_suite_spark import payload as spdf
from image_pdf_ocr_suite_spark.config import ExtractConfig
from image_pdf_ocr_suite_spark.kernels.images import images_to_searchable_pdf
from image_pdf_ocr_suite_spark.payload import Document, Page, Word

CFG = ExtractConfig()


def _img_payload(w, h, words):
    return spdf.encode(Document(pages=[Page(w, h, words)]))


def test_normalize_for_canvas_geometry():
    page = Page(50, 20, [Word(1, 1, 1, 1, 10, 5, 8, 6, 80, 0, "hi")])
    img = backends.rasterize(page)
    out = backends.normalize_for_canvas(img, 100, 100)
    assert out.array.shape == (100, 100, 3)
    # scale = min(100/50, 100/20) = 2 -> 100x40, centered vertically at y=30
    assert (out.array[0] == 255).all()               # top margin white
    # off_x = (100-100)//2 = 0, off_y = (100-40)//2 = 30
    w0 = out.page.words[0]
    assert (w0.left, w0.top) == (20.0, 40.0)         # 10*2+0, 5*2+30
    assert (w0.width, w0.height) == (16.0, 12.0)


def test_normalize_upscale_cap_and_centering():
    page = Page(10, 40, [])
    img = backends.rasterize(page)
    out = backends.normalize_for_canvas(img, 100, 100)
    # scale = min(10, 2.5) = 2.5 -> 25x100, centered horizontally
    inner = out.array[:, 37:62]
    assert out.array.shape == (100, 100, 3)
    assert (out.array[:, :37] == 255).all()


def test_images_to_searchable_pdf(spark):
    rows = []
    for g in ("a", "b"):
        for i in range(3):
            words = [Word(1, 1, 1, 1, 5, 5, 20, 8, 80.0, 0, f"w{g}{i}")]
            rows.append((g, i, _img_payload(40 + 10 * i, 30, words)))
    df = spark.createDataFrame(rows, "group string, image_index int, image binary")
    out = {r["group"]: r for r in images_to_searchable_pdf(df, CFG).collect()}
    assert set(out) == {"a", "b"}
    for g in ("a", "b"):
        pdf = bytes(out[g]["pdf"])
        assert out[g]["n_images"] == 3
        assert pdf.startswith(b"%PDF-1.4")
        assert pdf.count(b"/Type /Page ") == 3
        # all three pages share the max-extent canvas 60x30
        w_pt, h_pt = 60 * 72 / 300, 30 * 72 / 300
        assert pdf.count(f"/MediaBox [0 0 {w_pt:.2f} {h_pt:.2f}]".encode()) == 3
        # text layer contains each image's word
        for i in range(3):
            assert f"(w{g}{i}) Tj".encode() in pdf


def test_image_order_is_explicit_index(spark):
    # feed shuffled; page order must follow image_index, not arrival order
    words = lambda t: [Word(1, 1, 1, 1, 5, 5, 20, 8, 80.0, 0, t)]
    rows = [("g", 2, _img_payload(40, 30, words("third"))),
            ("g", 0, _img_payload(40, 30, words("first"))),
            ("g", 1, _img_payload(40, 30, words("second")))]
    df = spark.createDataFrame(rows, "group string, image_index int, image binary").repartition(3)
    pdf = bytes(images_to_searchable_pdf(df, CFG).head()["pdf"])
    assert pdf.index(b"(first) Tj") < pdf.index(b"(second) Tj") < pdf.index(b"(third) Tj")


def test_extent_kernel_is_header_only(monkeypatch):
    """The max-extent pass must use the header peek, never a full decode
    (single-decode fix: decode happens once, in the normalize kernel)."""
    import pandas as pd
    from image_pdf_ocr_suite_spark.kernels import images as ik

    def _boom(*a, **k):
        raise AssertionError("extent kernel called full spdf.decode")

    monkeypatch.setattr(ik.spdf, "decode", _boom)
    batch = pd.DataFrame({
        "group": ["g", "g"],
        "image_index": [0, 1],
        "image": [_img_payload(50, 20, []), _img_payload(70, 10, [])],
    })
    out = pd.concat(list(ik._extent_kernel(iter([batch]))))
    assert list(out["width"]) == [50, 70]
    assert list(out["height"]) == [20, 10]
