"""End-to-end pipeline job (jobs/pipeline_job.py): the crawl-to-shards
CLI composition equals the chained library operators, re-running a
committed run id is a no-op, and a run resumed mid-pipeline continues
from the committed stages without recomputing them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import mixing
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable
from jobs.corpus_job import clean_corpus
from jobs.crawl_ingest_job import ingest_pages
from jobs.export_job import pack_windows
from jobs.pipeline_job import main as pipeline_main, source_host_expr

SF = "/root/testdata/sf0.001"
TABLES = ("pages", "ingest_rejects", "clean", "clean_rejects",
          "mixture_report", "shards", "manifest")


def _archives_df(spark):
    """WARC archives over the sf0.001 documents table with FIVE hosts
    (so the mixture stage balances real sources) and the corpus's own
    varied texts as HTML bodies (so dedup keeps a non-trivial clean
    set and extraction takes the fast HTML-strip path)."""
    from image_pdf_ocr_suite_spark.tableio.warc import warc_record_expr

    d = spark.read.parquet(f"{SF}/documents.parquet")
    n = F.col("doc_id").cast("string")
    docs = d.select(
        "doc_id",
        F.concat(F.lit("https://s"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".example/"), n).alias("uri"),
        F.lit("2026-03-01T00:00:00Z").alias("dt"),
        F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>")).alias("body"))
    return docs.select(
        F.encode(warc_record_expr("uri", "dt", "body"), "UTF-8")
        .alias("warc"))


@pytest.fixture(scope="module")
def piperun(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("pipe")
    arch = str(base / "archives")
    _archives_df(spark).write.parquet(arch)
    root = str(base / "out")
    pipeline_main(["--archives-table", arch, "--output-root", root,
                   "--run-id", "pipe-t"], stop_session=False)
    return {"archives": arch, "root": root, "base": base}


def _read(spark, root, name):
    return SnapshotTable(f"{root}/{name}").read(spark)


def test_all_stage_tables_committed(spark, piperun):
    for t in TABLES:
        tbl = SnapshotTable(f"{piperun['root']}/{t}")
        snaps = tbl.snapshots()
        assert len(snaps) == 1 and snaps[0].run_id == "pipe-t", t


def test_stages_equal_library_operators(spark, piperun):
    root = piperun["root"]
    arch = spark.read.parquet(piperun["archives"])

    want_pages, _ = ingest_pages(arch)
    got_pages = _read(spark, root, "pages")
    assert sorted(r["url"] for r in got_pages.collect()) == \
        sorted(r["url"] for r in want_pages.collect())

    want_clean, _ = clean_corpus(got_pages, run_id="check")
    got_clean = _read(spark, root, "clean")
    assert sorted((r["url"], r["text"]) for r in got_clean.collect()) == \
        sorted((r["url"], r["text"]) for r in want_clean.collect())
    # non-degenerate: the varied-body corpus survives the funnel
    assert got_clean.count() > 50

    sourced = got_clean.withColumn("source", source_host_expr("url"))
    want_rep = {r["source"]: (r["n_docs"], r["rate_bp"], r["n_sampled"])
                for r in mixing.mixture_report(sourced, 2500,
                                               source_col="source",
                                               id_col="url").collect()}
    got_rep = {r["source"]: (r["n_docs"], r["rate_bp"], r["n_sampled"])
               for r in _read(spark, root, "mixture_report").collect()}
    assert got_rep == want_rep and len(got_rep) == 5

    sample = mixing.temperature_sample(sourced, 2500, source_col="source",
                                       id_col="url")
    want_w = pack_windows(sample, id_col="url", text_col="text")
    got_w = _read(spark, root, "shards")
    key = ("shard", "bin_id", "window_text", "n_tokens", "source_ids")
    assert sorted(tuple(r[k] for k in key) for r in got_w.collect()) == \
        sorted(tuple(r[k] for k in key) for r in want_w.collect())


def test_manifest_consistent_with_shards(spark, piperun):
    root = piperun["root"]
    shards = _read(spark, root, "shards")
    man = _read(spark, root, "manifest")
    want = {r["shard"]: (r["count"], r["tok"]) for r in
            shards.groupBy("shard")
                  .agg(F.count(F.lit(1)).alias("count"),
                       F.sum("n_tokens").alias("tok")).collect()}
    got = {r["shard"]: (r["n_windows"], r["n_tokens"])
           for r in man.collect()}
    assert got == want and sum(v[0] for v in got.values()) == shards.count()


def test_committed_run_id_is_a_noop(spark, piperun, monkeypatch):
    # every stage guard must hit: the expensive builders may not run
    def boom(*a, **k):
        raise AssertionError("stage recomputed on a committed run id")
    monkeypatch.setattr("jobs.pipeline_job.ingest_pages", boom)
    monkeypatch.setattr("jobs.pipeline_job.clean_corpus", boom)
    pipeline_main(["--archives-table", piperun["archives"],
                   "--output-root", piperun["root"],
                   "--run-id", "pipe-t"], stop_session=False)
    for t in TABLES:
        assert len(SnapshotTable(f"{piperun['root']}/{t}").snapshots()) == 1


def test_resume_continues_from_committed_stages(spark, piperun,
                                                monkeypatch):
    # a run that died after S2: pages + clean committed, S3/S4 not.
    # The resumed run must read the COMMITTED tables (never recompute
    # S1/S2 — they raise here) and produce identical shards, because
    # the sample is a deterministic view over the committed clean set.
    root2 = str(piperun["base"] / "out2")
    for t in ("pages", "ingest_rejects", "clean", "clean_rejects"):
        SnapshotTable(f"{root2}/{t}").append(
            _read(spark, piperun["root"], t), run_id="pipe-r")

    def boom(*a, **k):
        raise AssertionError("resume recomputed a committed stage")
    monkeypatch.setattr("jobs.pipeline_job.ingest_pages", boom)
    monkeypatch.setattr("jobs.pipeline_job.clean_corpus", boom)
    pipeline_main(["--archives-table", piperun["archives"],
                   "--output-root", root2,
                   "--run-id", "pipe-r"], stop_session=False)

    key = ("shard", "bin_id", "window_text", "n_tokens", "source_ids")
    a = sorted(tuple(r[k] for k in key)
               for r in _read(spark, root2, "shards").collect())
    b = sorted(tuple(r[k] for k in key)
               for r in _read(spark, piperun["root"], "shards").collect())
    assert a == b and a
