"""Streaming funnel twin (streaming/funnel_stream.py): cumulative
per-batch attrition == one-shot batch report, admitted ids match the
batch verdicts, and replayed micro-batches commit exactly once."""

from __future__ import annotations

from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import funnel
from image_pdf_ocr_suite_spark.streaming.funnel_stream import (
    funnel_report_total, start_funnel_stream)
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable

DOCS_SCHEMA = "doc_id long, url string, text string"


def _corpus(spark, n: int = 40):
    """n docs hitting every gate: %13==0 blocked domain, %5==2 no
    English tail (lang/gopher rejects), %7==3 repetitive boilerplate
    (compression reject), doc 0 is the held-out test doc."""
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra tango uniform victor whiskey xray yankee zulu apple "
             "banana cherry dates elder figs grape honey iris jade kiwi "
             "lemon mango nectar").split()
    rows = []
    for i in range(n):
        base = " ".join(words[(i * 7 + 3 * j) % 40] if j % 4
                        else f"u{i}x{j}" for j in range(70))
        url = ("https://downloads.badsite.example/x" if i % 13 == 0
               else f"https://ok.example.org/{i}")
        text = base
        if i % 5 != 2:
            text += (f" the w{i}a and w{i}b that w{i}c have w{i}d "
                     f"with w{i}e.")
        if i % 7 == 3:
            text += " click here to win free money now" * 40
        rows.append((i, url, text))
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_stream_funnel_matches_batch_and_replays_once(spark, tmp_path):
    docs = _corpus(spark)
    test_docs = docs.where(F.col("doc_id") == 0)

    input_dir = str(tmp_path / "docs_in")
    docs.where("doc_id < 15").coalesce(1).write.mode("append").parquet(input_dir)
    docs.where("doc_id >= 15 AND doc_id < 30").coalesce(1) \
        .write.mode("append").parquet(input_dir)
    docs.where("doc_id >= 30").coalesce(1).write.mode("append").parquet(input_dir)

    out_root = str(tmp_path / "funnel_out")
    ckpt = str(tmp_path / "funnel_ckpt")
    q = start_funnel_stream(spark, input_dir, DOCS_SCHEMA, out_root, ckpt,
                            test_docs=test_docs,
                            max_files_per_trigger=1)
    q.awaitTermination(180)

    report_table = SnapshotTable(f"{out_root}/attrition")
    admitted_table = SnapshotTable(f"{out_root}/admitted")
    per_batch = report_table.read(spark)
    # >1 micro-batch actually ran (the composition claim needs parts)
    assert per_batch.count() > 5

    total = {r["stage"]: r
             for r in funnel_report_total(per_batch).collect()}
    want = {r["stage"]: r
            for r in funnel.quality_funnel(docs, test_df=test_docs).collect()}
    for s in funnel.FUNNEL_STAGES:
        assert (total[s]["n_in"], total[s]["n_rejected"], total[s]["n_out"]) \
            == (want[s]["n_in"], want[s]["n_rejected"], want[s]["n_out"]), s

    got_ids = {r["id"] for r in admitted_table.read(spark).collect()}
    want_ids = {r["id"] for r in
                funnel.funnel_verdicts(docs, test_df=test_docs)
                .where(F.col("rej_at").isNull()).collect()}
    assert got_ids == want_ids and got_ids
    # the held-out doc itself must not be admitted (self-contamination)
    assert 0 not in {int(i) for i in got_ids}

    # restart with the same checkpoint: no new input -> no new snapshots
    n_rep = len(report_table.snapshots())
    n_adm = len(admitted_table.snapshots())
    q2 = start_funnel_stream(spark, input_dir, DOCS_SCHEMA, out_root, ckpt,
                             test_docs=test_docs,
                             max_files_per_trigger=1)
    q2.awaitTermination(120)
    assert len(report_table.snapshots()) == n_rep
    assert len(admitted_table.snapshots()) == n_adm
