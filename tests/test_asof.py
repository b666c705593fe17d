"""As-of backward join semantics (relational/asof.py) — the cases the
driver's events table can't exercise: NULL right values must NOT be
skipped in favor of older non-null rows (ASOF matches the latest ROW),
equal timestamps match inclusively, and missing priors yield NULL."""

from __future__ import annotations

from image_pdf_ocr_suite_spark.relational.asof import asof_join_backward


def _out(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "event_id long, k long, ts long")
    right = spark.createDataFrame(right_rows, "k long, ts long, v double")
    out = asof_join_backward(left, right, keys=["k"],
                             left_time="ts", right_time="ts",
                             value_cols=["v"])
    return {r["event_id"]: r["v"] for r in out.collect()}


def test_matched_null_value_stays_null(spark):
    # latest right row at ts=10 has v=NULL; merge_asof/DuckDB ASOF return
    # NULL, not the older ts=5 value
    got = _out(spark, [(1, 7, 12)], [(7, 5, 99.0), (7, 10, None)])
    assert got == {1: None}


def test_inclusive_equal_timestamp_and_no_prior(spark):
    got = _out(spark,
               [(1, 7, 10), (2, 7, 4), (3, 8, 10)],
               [(7, 10, 3.0), (7, 5, 2.0)])
    assert got[1] == 3.0      # right at the same instant matches
    assert got[2] is None     # no prior right row
    assert got[3] is None     # key never seen on the right


def test_values_carry_forward_per_key(spark):
    got = _out(spark,
               [(1, 7, 8), (2, 7, 20), (3, 9, 8)],
               [(7, 5, 1.0), (7, 10, 2.0), (9, 2, 5.0)])
    assert got == {1: 1.0, 2: 2.0, 3: 5.0}
