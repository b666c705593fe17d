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


def test_simhash_and_bpe_parity_on_unicode_whitespace(spark, tmp_path):
    """The generated corpus is ASCII-spaced; pin the cross-engine token
    split on REAL unicode whitespace (U+3000 ideographic space, NBSP, VT)
    so regenerated jpn-heavy testdata cannot silently break the gate."""
    rows = [(0, "日本　語 text"), (1, "a b c"), (2, "v\x0bt end"),
            (3, "mixed　  \t ws"), (4, ""), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pq = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")

    import __spark_entry__ as em
    from image_pdf_ocr_suite_spark.analytics import dedup, text as textops
    for spark_df, oracle in [
        (dedup.simhash_groups(df), em.oracle_sql()["simhash_groups"]),
        (dedup.simhash_near_pairs(df, max_hamming=3, n_bands=4),
         em.oracle_sql()["simhash_near_pairs"]),
        (textops.token_count_bpe(df), em.oracle_sql()["token_count_bpe"]),
        (textops.fingerprint(df), em.oracle_sql()["fingerprint"]),
        (textops.winnow_fingerprints(df), em.oracle_sql()["winnow_fingerprints"]),
    ]:
        got = _normalize(spark_df.toPandas())
        exp = _normalize(con.sql(oracle).df())
        assert got == exp


def test_nfc_parity_on_combining_chars(spark, tmp_path):
    rows = [(0, "éclair"), (1, "ガ"), (2, "ascii only"),
            (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pq = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")
    import __spark_entry__ as em
    from image_pdf_ocr_suite_spark.analytics import text as textops
    got = _normalize(textops.nfc_normalize(df).toPandas())
    exp = _normalize(con.sql(em.oracle_sql()["text_nfc"]).df())
    assert got == exp
