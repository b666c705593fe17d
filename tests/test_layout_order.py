"""Geometric reading-order reconstruction from bare boxes."""

import pytest

from image_pdf_ocr_suite_spark.relational.layout import (
    page_text_from_boxes,
    reconstruct_reading_order,
)

# two lines with jittered tops, words deliberately out of order
BOXES = [
    # (url, page, left, top, width, height, text)
    ("u", 1, 120.0, 11.0, 30.0, 10.0, "brown"),
    ("u", 1, 10.0, 10.0, 40.0, 10.0, "the"),
    ("u", 1, 60.0, 12.0, 50.0, 10.0, "quick"),
    ("u", 1, 70.0, 31.0, 40.0, 10.0, "over"),
    ("u", 1, 10.0, 30.0, 50.0, 10.0, "jumps"),
    ("u", 2, 10.0, 10.0, 30.0, 10.0, "page2"),
]
SCHEMA = "url string, page int, left double, top double, width double, height double, text string"


def test_reading_rank_follows_lines(spark):
    df = spark.createDataFrame(BOXES, SCHEMA).repartition(3)
    out = reconstruct_reading_order(df)
    ranked = {(r["page"], r["reading_rank"]): r["text"]
              for r in out.collect()}
    assert [ranked[(1, i)] for i in range(1, 6)] == \
        ["the", "quick", "brown", "jumps", "over"]
    assert ranked[(2, 1)] == "page2"


def test_page_text_from_boxes(spark):
    df = spark.createDataFrame(BOXES, SCHEMA)
    texts = {(r["url"], r["page"]): r["page_text"]
             for r in page_text_from_boxes(df).collect()}
    assert texts[("u", 1)] == "the quick brown\njumps over"
    assert texts[("u", 2)] == "page2"


def test_line_tolerance_splits_close_lines(spark):
    rows = [("u", 1, 10.0, 10.0, 20.0, 10.0, "a"),
            ("u", 1, 10.0, 18.0, 20.0, 10.0, "b")]   # gap 8 > 0.6*10
    df = spark.createDataFrame(rows, SCHEMA)
    out = page_text_from_boxes(df).head()
    assert out["page_text"] == "a\nb"
    out2 = page_text_from_boxes(df, line_tol=1.0).head()
    assert out2["page_text"] == "a b"                 # gap 8 <= 1.0*10
