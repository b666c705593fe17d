"""C4 line-level cleaning rules (analytics/text.py::c4_line_filter,
Raffel et al. 2020 §2.2) on hand-written fixtures."""

from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import text as textops


def _run(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: r for r in textops.c4_line_filter(df).collect()}


def test_line_rules(spark):
    good = "one two three four five six."
    out = _run(spark, [
        (1, f"{good}\n{good}\n{good}"),                  # 3 kept -> keep
        (2, f"{good}\nno terminal punct here at all\n{good}\n{good}"),
        (3, f"{good}\ntoo short.\n{good}\n{good}"),      # <5 words dropped
        (4, 'she said "quote ends are fine too."\n' + f"{good}\n{good}"),
    ])
    assert out[1]["keep"] and out[1]["n_lines_kept"] == 3
    assert out[2]["n_lines_kept"] == 3 and out[2]["n_lines_total"] == 4
    assert out[2]["clean_text"] == f"{good}\n{good}\n{good}"
    assert out[3]["n_lines_kept"] == 3                   # short line gone
    assert out[4]["n_lines_kept"] == 3                   # " terminator ok


def test_document_rules(spark):
    good = "one two three four five six."
    out = _run(spark, [
        (1, f"{good}\n{good}"),                          # only 2 kept lines
        (2, f"{good}\n{good}\nsome Lorem Ipsum filler words here."),
        (3, f"{good}\n{good}\nvar x = {{'a': 1}} in code six words."),
        (4, f"{good}\n{good}\n{good}"),
    ])
    assert not out[1]["keep"]                            # < 3 kept lines
    assert not out[2]["keep"]                            # lorem ipsum
    assert not out[3]["keep"]                            # curly brace
    assert out[4]["keep"]


def test_map_only_plan(spark):
    df = spark.createDataFrame([(1, "a b c d e f.")],
                               "doc_id long, text string")
    plan = textops.c4_line_filter(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
