import numpy as np
import pandas as pd
import pytest

from image_pdf_ocr_suite_spark import backends, refmodel
from image_pdf_ocr_suite_spark import payload as spdf
from image_pdf_ocr_suite_spark.config import ExtractConfig
from image_pdf_ocr_suite_spark.payload import Document, Page, Word

CFG = ExtractConfig()


def _page(base, pre, texts=("foo", "bar")):
    words = [Word(1, 1, 1, i + 1, 10 + 20 * i, 12, 15, 10, base, pre, t)
             for i, t in enumerate(texts)]
    return Page(100, 40, words)


# --- operator-level parity with ocr.py -------------------------------------

def test_average_confidence_semantics():
    # mean of conf>=0; 0.0 for all-invalid or missing column (ocr.py:90-102)
    f = pd.DataFrame({"conf": [-1, 50, 70, None, "bad"]})
    assert refmodel.compute_average_confidence(f) == 60.0
    assert refmodel.compute_average_confidence(pd.DataFrame({"conf": [-1, -1]})) == 0.0
    assert refmodel.compute_average_confidence(pd.DataFrame({"x": [1]})) == 0.0


def test_prepare_frame_rescale():
    f = pd.DataFrame({"left": [15], "top": [30], "width": ["bad"], "height": [9], "conf": [75]})
    out = refmodel.prepare_frame(f, scale=1.5)
    assert out["left"][0] == 10.0 and out["top"][0] == 20.0 and out["height"][0] == 6.0
    assert np.isnan(out["width"][0])
    assert out["conf"][0] == 75            # conf never rescaled


def test_filter_frame_by_confidence():
    f = pd.DataFrame({"conf": [49.9, 50.0, 80, -1, None], "text": ["a", None, "c", "d", "e"]})
    out = refmodel.filter_frame_by_confidence(f, 50.0)
    assert list(out["conf"]) == [50.0, 80]
    assert list(out["text"]) == ["", "c"]  # fillna("") (ocr.py:131)
    assert refmodel.filter_frame_by_confidence(pd.DataFrame({"x": [1]}), 50.0).empty


def test_adaptive_high_conf_skips_second_pass():
    img = backends.rasterize(_page(80.0, 99.0))
    r = refmodel.perform_adaptive_ocr(img, CFG)
    assert not r.used_preprocessing and r.average_confidence == 80.0


def test_adaptive_retry_and_win():
    img = backends.rasterize(_page(50.0, 72.0))
    r = refmodel.perform_adaptive_ocr(img, CFG)
    assert r.used_preprocessing and r.average_confidence == 72.0
    # winner boxes rescaled back to base coords: round(10*1.5)/1.5 = 10.0
    w = r.frame[r.frame["level"] == 5]
    assert list(w["left"]) == [10.0, 30.0]


def test_adaptive_retry_keep_base():
    img = backends.rasterize(_page(60.0, 52.0))
    r = refmodel.perform_adaptive_ocr(img, CFG)
    assert not r.used_preprocessing and r.average_confidence == 60.0


def test_adaptive_tie_keeps_base():
    # strict > (ocr.py:71): equal averages keep the base result
    img = backends.rasterize(_page(55.0, 55.0))
    r = refmodel.perform_adaptive_ocr(img, CFG)
    assert not r.used_preprocessing


# --- document-level assembly (ocr.py:751-780) --------------------------------

def test_extract_text_headers_and_strip():
    doc = Document(pages=[_page(80, 40, ("hello", "world")),
                          _page(80, 40, ("second",))])
    text = refmodel.extract_text(spdf.encode(doc))
    assert text == "--- ページ 1 ---\nhello world\n\n--- ページ 2 ---\nsecond\n"


def test_extract_text_empty_doc():
    assert refmodel.extract_text(spdf.encode(Document(pages=[]))) == "\n"


def test_extract_text_whitespace_only_page():
    doc = Document(pages=[Page(100, 40, [Word(1, 1, 1, 1, 0, 0, 5, 5, 80, 80, None)])])
    text = refmodel.extract_text(spdf.encode(doc))
    # doc-level strip() (ocr.py:780) eats the empty page body
    assert text == "--- ページ 1 ---\n"


def test_extract_text_adaptive_changes_text():
    # words illegible on base (conf 25) become legible on preprocessed (75)
    doc = Document(pages=[_page(25.0, 75.0, ("now", "visible"))])
    text = refmodel.extract_text(spdf.encode(doc))
    assert text == "--- ページ 1 ---\nnow visible\n"


# --- spans (ocr.py:487-511) ---------------------------------------------------

def test_extract_spans_filter_and_geometry():
    page = Page(100, 40, [
        Word(1, 1, 1, 1, 10, 12, 15, 10, 80.0, 0, "keep"),
        Word(1, 1, 1, 2, 30, 12, 15, 10, 49.9, 0, "drop_lowconf"),
        Word(1, 1, 1, 3, 50, 12, 15, 10, 80.0, 0, "  "),     # strips empty
        Word(1, 1, 1, 4, 70, 12, 15, 10, 80.0, 0, None),     # null text
    ])
    spans = refmodel.extract_spans(spdf.encode(Document(pages=[page])))
    assert len(spans) == 1
    s = spans[0]
    assert s["text"] == "keep" and s["conf"] == 80.0
    assert s["x"] == 10.0 and s["y"] == 22.0 and s["fontsize"] == 8.0
