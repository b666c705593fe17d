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


def test_bucketed_equals_unbucketed_random(spark):
    """Time-bucket pre-split (hot-key defense) must be output-identical:
    random data, several keys, duplicates across bucket boundaries,
    empty buckets between right rows, null right values."""
    import numpy as np
    rng = np.random.RandomState(13)
    left_rows = [(i, int(rng.randint(0, 5)), int(rng.randint(0, 1000)))
                 for i in range(300)]
    right_rows = [(int(rng.randint(0, 5)), int(rng.randint(0, 1000)),
                   None if rng.rand() < 0.1 else float(rng.rand()))
                  for _ in range(80)]
    # unique right (k, ts): the operator's caller contract
    seen, uniq = set(), []
    for k, ts, v in right_rows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            uniq.append((k, ts, v))
    left = spark.createDataFrame(left_rows, "event_id long, k long, ts long")
    right = spark.createDataFrame(uniq, "k long, ts long, v double")
    base = asof_join_backward(left, right, keys=["k"], left_time="ts",
                              right_time="ts", value_cols=["v"])
    ref = sorted((r["event_id"], r["v"]) for r in base.collect())
    for width in (7.0, 50.0, 100000.0):   # many buckets ... one bucket
        got = asof_join_backward(left, right, keys=["k"], left_time="ts",
                                 right_time="ts", value_cols=["v"],
                                 bucket_seconds=width)
        assert sorted((r["event_id"], r["v"]) for r in got.collect()) == ref, width


def test_bucketed_timestamp_column(spark):
    from datetime import datetime

    def t(m):
        return datetime(2024, 1, 1, 0, m, 0)

    left = spark.createDataFrame(
        [(1, 7, t(30)), (2, 7, t(59))], "event_id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(7, t(0), 1.0), (7, t(45), 2.0)], "k long, ts timestamp, v double")
    got = {r["event_id"]: r["v"] for r in asof_join_backward(
        left, right, keys=["k"], left_time="ts", right_time="ts",
        value_cols=["v"], bucket_seconds=600).collect()}
    assert got == {1: 1.0, 2: 2.0}


def test_bucketed_partitions_on_key_and_bucket(spark):
    left = spark.createDataFrame([(1, 7, 10)], "event_id long, k long, ts long")
    right = spark.createDataFrame([(7, 5, 1.0)], "k long, ts long, v double")
    plan = asof_join_backward(
        left, right, keys=["k"], left_time="ts", right_time="ts",
        value_cols=["v"], bucket_seconds=60) \
        ._jdf.queryExecution().executedPlan().toString()
    import re
    assert re.search(r"hashpartitioning\(k#\d+L?, __asof_bkt", plan), plan
