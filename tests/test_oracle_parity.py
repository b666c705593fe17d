"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle_sql() must match DuckDB on row count, column names, and an
order-insensitive value multiset at sf0.01."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()
SQL_CHECKED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, int):
        return int(v)
    return v


def _normalize(pdf):
    pdf = pdf[sorted(pdf.columns)]
    rows = [tuple(_canon(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows, key=repr)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, ddb, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    exp = ddb.sql(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
    assert len(got) == len(exp), f"{name}: {len(got)} rows != {len(exp)}"
    g, e = _normalize(got), _normalize(exp)
    bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
    assert g == e, f"{name}: first diffs {bad}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)
