"""Index-lifecycle job (jobs/index_job.py): the CLI's committed query
report equals the library operators it composes, build+append equals a
one-shot build, the stream modes reach the same serving layouts, and a
re-run with the same run_id is a no-op."""

from __future__ import annotations

import pytest

from image_pdf_ocr_suite_spark.analytics import dedup, lexindex
from image_pdf_ocr_suite_spark.analytics import text as textops
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable
from jobs.index_job import main as idx_main

TERMS = "hash,join,filter,zebra"


def _docs(spark):
    words = ["hash", "join", "filter", "scan", "sort", "zebra"]
    rows = [(i, " ".join(words[(i + j) % len(words)]
                         for j in range(3 + i % 5))) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("idxjob") / "docs")
    _docs(spark).write.parquet(p)
    return p


def test_lexical_build_report_matches_library(spark, tmp_path, docs_path):
    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")
    idx_main(["--input-table", docs_path, "--index-path", idx,
              "--output-root", out, "--family", "lexical",
              "--mode", "build", "--query-terms", TERMS,
              "--n-buckets", "16", "--run-id", "lex-1"],
             stop_session=False)
    got = {r["doc_id"]: (r["n_terms_hit"], r["score"])
           for r in SnapshotTable(f"{out}/report").read(spark).collect()}
    exp = {r["doc_id"]: (r["n_terms_hit"], r["score"])
           for r in textops.bm25_scores(_docs(spark), TERMS.split(","))
                           .where("n_terms_hit >= 1").collect()}
    assert got == exp
    # replay with the same run_id is a no-op
    n = SnapshotTable(f"{out}/report").read(spark).count()
    idx_main(["--input-table", docs_path, "--index-path", idx,
              "--output-root", out, "--family", "lexical",
              "--mode", "build", "--query-terms", TERMS,
              "--n-buckets", "16", "--run-id", "lex-1"],
             stop_session=False)
    assert SnapshotTable(f"{out}/report").read(spark).count() == n


def test_lexical_build_plus_append_equals_one_shot(spark, tmp_path,
                                                   docs_path):
    docs = _docs(spark)
    p1, p2 = str(tmp_path / "half"), str(tmp_path / "rest")
    docs.where("doc_id < 30").write.parquet(p1)
    docs.where("doc_id >= 30").write.parquet(p2)
    idx = str(tmp_path / "idx2")
    idx_main(["--input-table", p1, "--index-path", idx,
              "--output-root", str(tmp_path / "o1"),
              "--family", "lexical", "--mode", "build",
              "--n-buckets", "16", "--run-id", "a-1"],
             stop_session=False)
    idx_main(["--input-table", p2, "--index-path", idx,
              "--output-root", str(tmp_path / "o2"),
              "--family", "lexical", "--mode", "append",
              "--run-id", "a-2"],
             stop_session=False)
    got = {r["doc_id"]: (r["n_terms_hit"], r["score"])
           for r in lexindex.bm25_from_index(spark, idx,
                                             TERMS.split(",")).collect()}
    exp = {r["doc_id"]: (r["n_terms_hit"], r["score"])
           for r in textops.bm25_scores(docs, TERMS.split(","))
                           .where("n_terms_hit >= 1").collect()}
    assert got == exp


def test_append_retry_after_crash_is_idempotent(spark, tmp_path,
                                                docs_path, monkeypatch):
    """A crash between the layout append and the report commit must not
    double-append on retry (the _run_<id> mutation marker)."""
    import jobs.index_job as ij
    docs = _docs(spark)
    idx = str(tmp_path / "idx3")
    idx_main(["--input-table", docs_path, "--index-path", idx,
              "--output-root", str(tmp_path / "o3"),
              "--family", "lexical", "--mode", "build",
              "--n-buckets", "16", "--run-id", "c-1"],
             stop_session=False)
    p2 = str(tmp_path / "more")
    extra = spark.createDataFrame([(1000, "hash zebra hash")],
                                  "doc_id long, text string")
    extra.write.parquet(p2)

    # simulate the crash: report commit raises AFTER the append ran
    class Boom(RuntimeError):
        pass

    orig = ij.SnapshotTable.append

    def crash(self, df, run_id):
        raise Boom()

    monkeypatch.setattr(ij.SnapshotTable, "append", crash)
    try:
        idx_main(["--input-table", p2, "--index-path", idx,
                  "--output-root", str(tmp_path / "o4"),
                  "--family", "lexical", "--mode", "append",
                  "--run-id", "c-2"], stop_session=False)
    except Boom:
        pass
    monkeypatch.setattr(ij.SnapshotTable, "append", orig)
    # retry with the same run_id: the append must NOT run again
    idx_main(["--input-table", p2, "--index-path", idx,
              "--output-root", str(tmp_path / "o4"),
              "--family", "lexical", "--mode", "append",
              "--run-id", "c-2"], stop_session=False)
    got = {r["doc_id"]: (r["n_terms_hit"], r["score"])
           for r in lexindex.bm25_from_index(spark, idx,
                                             TERMS.split(",")).collect()}
    exp = {r["doc_id"]: (r["n_terms_hit"], r["score"])
           for r in textops.bm25_scores(docs.unionByName(extra),
                                        TERMS.split(","))
                           .where("n_terms_hit >= 1").collect()}
    assert got == exp      # no duplicated postings, constants exact


def test_minhash_build_report_matches_library(spark, tmp_path, docs_path):
    out, idx = str(tmp_path / "mout"), str(tmp_path / "midx")
    idx_main(["--input-table", docs_path, "--index-path", idx,
              "--output-root", out, "--family", "minhash",
              "--mode", "build", "--run-id", "mh-1"],
             stop_session=False)
    got = sorted((r["new_id"], r["index_id"]) for r in
                 SnapshotTable(f"{out}/report").read(spark).collect())
    exp = sorted((r["new_id"], r["index_id"]) for r in
                 dedup.dedup_against_index(_docs(spark), spark, idx)
                 .collect())
    assert got == exp and len(got) > 0


def test_minhash_stream_mode_admits_and_compacts(spark, tmp_path):
    docs = _docs(spark)
    in_dir = str(tmp_path / "sin")
    docs.where("doc_id < 30").coalesce(1).write.mode("append").parquet(in_dir)
    docs.where("doc_id >= 30").coalesce(1).write.mode("append").parquet(in_dir)
    out, idx = str(tmp_path / "sout"), str(tmp_path / "sidx")
    idx_main(["--input-table", in_dir, "--index-path", idx,
              "--output-root", out, "--family", "minhash",
              "--mode", "stream", "--run-id", "mh-s1"],
             stop_session=False)
    admitted = {r["doc_id"] for r in
                SnapshotTable(f"{out}/report").read(spark).collect()}
    assert 0 < len(admitted) <= docs.count()
    # the compacted signature layout is probe-able
    probe = dedup.dedup_against_index(docs.limit(10), spark, idx)
    assert probe.count() >= 0
