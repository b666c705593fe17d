"""Gopher quality rules (analytics/text.py::gopher_quality): closed-form
fixtures hitting each rule boundary, integer-exact stats, null handling."""

from __future__ import annotations

from image_pdf_ocr_suite_spark.analytics import text as textops

# 60 words, all alphabetic, mean length (3*59+4)/60 in [3,10], several
# distinct stop words, no symbols/bullets/ellipses -> passes every rule
GOOD = ("the and that have with was for are this from " * 6).strip()


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r.asDict()
            for r in textops.gopher_quality(df).collect()}


def test_good_doc_passes(spark):
    out = _run(spark, [(1, GOOD)])[1]
    assert out["n_words"] == 60
    assert out["n_stop_hits"] >= 2
    assert out["gopher_pass"] == 1


def test_word_count_bounds(spark):
    short = "the and " + "word " * 47  # 49 words
    out = _run(spark, [(1, short.strip())])[1]
    assert out["n_words"] == 49 and out["gopher_pass"] == 0


def test_mean_word_length_bounds(spark):
    # 60 words of length 2 -> mean 2 < 3 -> fail
    twos = ("to be of an it is at on we he " * 6).strip()
    out = _run(spark, [(1, twos)])[1]
    assert out["sum_word_len"] == 120
    assert out["gopher_pass"] == 0
    # 60 words of length 11 -> mean 11 > 10 -> fail
    longs = " ".join(["abcdefghijk"] * 58 + ["the", "and"])
    out = _run(spark, [(1, longs)])[1]
    assert out["gopher_pass"] == 0


def test_symbol_ratio(spark):
    # 7 hashes over 60 words -> 10*7 > 60 -> fail
    out = _run(spark, [(1, GOOD + " " + "#" * 7)])[1]
    assert out["n_symbol_units"] == 7
    assert out["gopher_pass"] == 0
    # '...' counts in units of three dots; '…' counts per char
    out = _run(spark, [(2, GOOD + " x...y…z")])[2]
    assert out["n_symbol_units"] == 2


def test_bullet_and_ellipsis_lines(spark):
    body = GOOD
    bullets = "\n".join(["- item"] * 19 + [body])  # 19/20 > 0.9
    out = _run(spark, [(1, bullets)])[1]
    assert out["n_lines"] == 20 and out["n_bullet_lines"] == 19
    assert out["gopher_pass"] == 0
    ell = "\n".join(["trailing..."] * 4 + [body] * 6)  # 4/10 > 0.3
    out = _run(spark, [(2, ell)])[2]
    assert out["n_ellipsis_lines"] == 4 and out["gopher_pass"] == 0


def test_alpha_word_ratio_and_stopwords(spark):
    # 60 words, 15 of them pure digits -> 45/60 = 0.75 < 0.8 -> fail
    digits = " ".join(["123"] * 15)
    words = ("the and that have " * 11).strip()  # 44 alpha words
    text = words + " " + digits + " tail"  # 45 alpha + 15 digit = 60
    out = _run(spark, [(1, text)])[1]
    assert out["n_words"] == 60 and out["n_alpha_words"] == 45
    assert out["gopher_pass"] == 0
    # enough words but zero stop words -> fail
    nostop = " ".join(["word%d" % i for i in range(60)])
    out = _run(spark, [(2, nostop)])[2]
    assert out["n_stop_hits"] == 0 and out["gopher_pass"] == 0


def test_null_and_empty_text(spark):
    out = _run(spark, [(1, None), (2, "")])
    for k in (1, 2):
        assert out[k]["n_words"] == 0
        assert out[k]["gopher_pass"] == 0
