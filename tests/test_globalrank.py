"""Distributed stable global rank (relational/globalrank.py).

Pins: rank == ROW_NUMBER under the same total order (a permutation of
0..n-1) across partition counts and input layouts, descending +
multi-column orders, shard cutting, and the plan shape (ONE
rangepartitioning exchange, no single-partition Window node).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.relational.globalrank import (
    curriculum_shards, global_rank)


@pytest.fixture(scope="module")
def df(spark):
    # values with heavy ties (v = i % 7) force the unique tiebreaker to
    # carry the order; scattered input layout
    rows = [(i, i % 7, f"d{i}") for i in range(500)]
    return spark.createDataFrame(
        rows, "doc_id long, v long, name string").repartition(13)


def _expected(rows, key):
    return {r: i for i, r in enumerate(sorted(rows, key=key))}


def test_rank_matches_row_number(spark, df):
    rows = [(r["doc_id"], r["v"]) for r in df.select("doc_id", "v").collect()]
    exp = _expected(rows, key=lambda t: (t[1], t[0]))
    for n_parts in (2, 7, None):
        got = {(r["doc_id"], r["v"]): r["rk"]
               for r in global_rank(df, ["v", "doc_id"],
                                    n_partitions=n_parts).collect()}
        assert got == exp, f"n_partitions={n_parts}"
        assert sorted(got.values()) == list(range(500))


def test_rank_descending_and_expr_order(spark, df):
    got = {r["doc_id"]: r["rk"]
           for r in global_rank(
               df, [F.desc("v"), F.asc("doc_id")]).collect()}
    rows = [(r["doc_id"], r["v"]) for r in df.select("doc_id", "v").collect()]
    exp = {t[0]: i for i, t in
           enumerate(sorted(rows, key=lambda t: (-t[1], t[0])))}
    assert got == exp


def test_curriculum_shards(spark, df):
    out = curriculum_shards(df, ["v", "doc_id"], shard_size=64)
    rows = out.select("rk", "shard").collect()
    assert all(r["shard"] == r["rk"] // 64 for r in rows)
    sizes = {r["shard"]: r["c"]
             for r in out.groupBy("shard").agg(
                 F.count(F.lit(1)).alias("c")).collect()}
    # 500/64: seven full shards + a 52-row tail
    assert sizes == {i: 64 for i in range(7)} | {7: 52}
    with pytest.raises(ValueError):
        curriculum_shards(df, ["doc_id"], shard_size=0)


def test_plan_one_range_exchange_no_window(spark, df):
    # the sorted frame that global_rank materializes once: exactly one
    # data-sized exchange, the range repartition (the input fixture's
    # own repartition(13) round-robin sits upstream of it)
    srt = df.repartitionByRange("v", "doc_id") \
            .sortWithinPartitions("v", "doc_id")
    pre = srt._jdf.queryExecution().executedPlan().toString()
    assert pre.count("Exchange rangepartitioning") == 1

    # the rank pass itself is map-only over the checkpointed partitions:
    # no further exchange, no Window node, no Python stage
    plan = global_rank(df, ["v", "doc_id"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan
