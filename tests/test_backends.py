import numpy as np
import pandas as pd
import pytest

from image_pdf_ocr_suite_spark import backends
from image_pdf_ocr_suite_spark.payload import Page, Word


def _page(confs=((80.0, 40.0), (60.0, 70.0)), texts=("foo", "bar")):
    words = [
        Word(1, 1, 1, i + 1, 10 + 20 * i, 12, 15, 10, cb, cp, t)
        for i, ((cb, cp), t) in enumerate(zip(confs, texts))
    ]
    return Page(width_px=100, height_px=40, words=words)


def test_rasterize_shape_and_ink():
    img = backends.rasterize(_page())
    assert img.array.shape == (40, 100, 3)
    assert img.mode == "RGB" and img.scale == 1.0
    assert img.array[0, 0, 0] == 255            # background white
    assert img.array[15, 12, 0] == 40           # inside first word box


def test_preprocess_geometry_and_binarization():
    img = backends.rasterize(_page())
    pre, scale = backends.preprocess(img, upscale=1.5, binarize_threshold=180)
    assert scale == 1.5
    assert pre.array.shape == (60, 150)          # int(40*1.5), int(100*1.5)
    assert pre.mode == "L" and pre.preprocessed and pre.scale == 1.5
    vals = np.unique(pre.array)
    assert set(vals.tolist()) <= {0, 255}        # binarized
    assert (pre.array == 0).any() and (pre.array == 255).any()


def test_ocr_boxes_base_vs_preprocessed():
    page = _page()
    img = backends.rasterize(page)
    base = backends.ocr_boxes(img)
    # structural rows: 1 page row + 1 line row, conf -1, text NaN/None
    assert (base["conf"] < 0).sum() == 2
    words = base[base["level"] == 5]
    assert list(words["conf"]) == [80.0, 60.0]
    assert list(words["left"]) == [10.0, 30.0]

    pre, _ = backends.preprocess(img)
    pboxes = backends.ocr_boxes(pre)
    pwords = pboxes[pboxes["level"] == 5]
    assert list(pwords["conf"]) == [40.0, 70.0]   # conf_pre
    assert list(pwords["left"]) == [15.0, 45.0]   # ×1.5, rounded


def test_ocr_text_reading_order_and_legibility():
    words = [
        Word(1, 1, 1, 1, 0, 0, 5, 5, 80, 80, "a"),
        Word(1, 1, 1, 2, 10, 0, 5, 5, 80, 80, "b"),
        Word(1, 1, 2, 1, 0, 10, 5, 5, 80, 80, "c"),
        Word(2, 1, 1, 1, 0, 30, 5, 5, 80, 80, "d"),
        Word(2, 1, 1, 2, 10, 30, 5, 5, 10.0, 80, "faint"),   # < floor on base
        Word(2, 1, 1, 3, 20, 30, 5, 5, 80, 80, None),        # NaN text
    ]
    page = Page(60, 60, words)
    img = backends.rasterize(page)
    assert backends.ocr_text(img) == "a b\nc\n\nd\n"
    pre, _ = backends.preprocess(img)
    assert backends.ocr_text(pre) == "a b\nc\n\nd faint\n"   # legible after pre


def test_ocr_text_empty_page():
    img = backends.rasterize(Page(50, 50, []))
    assert backends.ocr_text(img) == "\n"


def test_parse_langs():
    from image_pdf_ocr_suite_spark.backends import parse_langs
    assert parse_langs("jpn") == ("jpn",)
    assert parse_langs("jpn+eng") == ("jpn", "eng")
    for bad in ("", "jpn+", "JPN", "j p n", "japanese", "jpn++eng"):
        with pytest.raises(ValueError):
            parse_langs(bad)


def test_config_rejects_bad_lang():
    from image_pdf_ocr_suite_spark.config import ExtractConfig
    with pytest.raises(ValueError):
        ExtractConfig(lang="jpn+")
    assert ExtractConfig(lang="jpn+eng").lang == "jpn+eng"


def test_jpn_eng_extraction_golden(spark):
    """north_star: lang='jpn+eng' flows end-to-end; on the deterministic
    backend (ground truth carries the text) adding a language never removes
    words, so output is byte-identical to the jpn run and to the reference
    model under the same config."""
    from image_pdf_ocr_suite_spark import fixtures, refmodel
    from image_pdf_ocr_suite_spark.config import ExtractConfig
    from image_pdf_ocr_suite_spark.pipeline import extract_pages

    rows = [(i, f"こんにちは world w{i} 混在 text t{i}", "ja") for i in range(6)]
    pdf = fixtures.build_pages_pdf(rows)
    pages = spark.createDataFrame(pdf)

    got = {}
    for lang in ("jpn", "jpn+eng"):
        res = extract_pages(pages, ExtractConfig(lang=lang), run_id=lang)
        got[lang] = {r["url"]: r["extracted_text"] for r in res.text.collect()}
    assert got["jpn"] == got["jpn+eng"]

    cfg = ExtractConfig(lang="jpn+eng")
    expected = {url: refmodel.extract_text(raw, cfg)
                for url, raw in zip(pdf["url"], pdf["html"])
                if url in got["jpn+eng"]}
    assert got["jpn+eng"] == expected
