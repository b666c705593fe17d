"""Materialized inverted index (analytics/lexindex.py): the term-bucket
layout must prune at the scan, the probe must be BIT-identical to the
full-scan bm25_scores on the hit set, and appends must update the
corpus constants exactly."""

import glob
import re

import pytest
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import lexindex
from image_pdf_ocr_suite_spark.analytics import text as textops

N_BUCKETS = 16
TERMS = ["hash", "join", "filter", "zebra"]


@pytest.fixture(scope="module")
def docs_df(spark):
    words = ["hash", "join", "filter", "scan", "sort", "merge", "agg"]
    rows = []
    for i in range(120):
        toks = [words[(i + j) % len(words)] for j in range(i % 9)]
        rows.append((i, " ".join(toks)))
    rows.append((120, None))          # null text: counts in N, no postings
    rows.append((121, ""))            # empty text: same
    rows.append((122, "zebra zebra hash"))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def index_path(spark, docs_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lex") / "index")
    lexindex.write_inverted_index(docs_df, path, n_buckets=N_BUCKETS)
    return path


def test_layout_and_sidecar(index_path, docs_df):
    stats = lexindex.read_index_stats(index_path)
    assert stats["n_docs"] == docs_df.count()
    assert stats["n_buckets"] == N_BUCKETS
    exp_sumdl = docs_df.select(F.sum(F.size(F.filter(
        F.split(F.coalesce("text", F.lit("")), " "),
        lambda x: x != "")))).head()[0]
    assert stats["sum_dl"] == exp_sumdl
    buckets = sorted(int(p.rsplit("=", 1)[1])
                     for p in glob.glob(f"{index_path}/bucket=*"))
    assert buckets and set(buckets) <= set(range(N_BUCKETS))


def test_postings_are_unique_per_term_doc(spark, index_path):
    posts = spark.read.parquet(index_path)
    assert posts.count() == posts.select("term", "doc_id").distinct().count()
    # dl is denormalized: constant per doc
    assert (posts.select("doc_id", "dl").distinct()
            .groupBy("doc_id").count().where("count > 1").count()) == 0


def test_probe_prunes_partitions(spark, index_path):
    probe = lexindex.bm25_from_index(spark, index_path, TERMS)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan
    # the term equality reaches the parquet scan
    p = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert p and "term" in p.group(1), plan
    # file-level: the scan touches at most len(TERMS) of the buckets
    want = {lexindex.term_bucket(t, N_BUCKETS) for t in TERMS}
    full = spark.read.parquet(index_path)
    n_full = full.select("bucket").distinct().count()
    pruned = full.where(F.col("bucket").isin(sorted(want)))
    assert pruned.select("bucket").distinct().count() <= len(want) < n_full


def test_probe_bit_identical_to_full_scan(spark, docs_df, index_path):
    got = {r["doc_id"]: (r["n_terms_hit"], r["score"])
           for r in lexindex.bm25_from_index(spark, index_path,
                                             TERMS).collect()}
    exp = {r["doc_id"]: (r["n_terms_hit"], r["score"])
           for r in textops.bm25_scores(docs_df, TERMS)
                           .where("n_terms_hit >= 1").collect()}
    assert set(got) == set(exp)
    for did, (hits, score) in exp.items():
        assert got[did][0] == hits
        assert got[did][1] == score, (did, got[did][1], score)  # exact ==


def test_append_updates_constants_and_results(spark, docs_df, tmp_path):
    path = str(tmp_path / "index")
    first = docs_df.where("doc_id < 60")
    rest = docs_df.where("doc_id >= 60")
    lexindex.write_inverted_index(first, path, n_buckets=N_BUCKETS)
    lexindex.append_to_inverted_index(rest, path)
    stats = lexindex.read_index_stats(path)
    assert stats["n_docs"] == docs_df.count()
    got = {r["doc_id"]: (r["n_terms_hit"], r["score"])
           for r in lexindex.bm25_from_index(spark, path, TERMS).collect()}
    exp = {r["doc_id"]: (r["n_terms_hit"], r["score"])
           for r in textops.bm25_scores(docs_df, TERMS)
                           .where("n_terms_hit >= 1").collect()}
    assert got == exp


def test_empty_terms_guard(spark, index_path):
    with pytest.raises(ValueError):
        lexindex.bm25_from_index(spark, index_path, [])


def test_term_bucket_matches_engine_hash(spark):
    df = spark.createDataFrame([("hash",), ("zebra",), ("日本語",)],
                               "term string")
    rows = df.select("term", F.pmod(
        __import__("image_pdf_ocr_suite_spark.analytics.sketches",
                   fromlist=["hash48_expr"]).hash48_expr("term"),
        F.lit(N_BUCKETS)).cast("int").alias("b")).collect()
    for r in rows:
        assert lexindex.term_bucket(r["term"], N_BUCKETS) == r["b"]
