"""Funnel admission job (jobs/funnel_job.py): the CLI composition
commits admitted ids + the attrition report, and the two tables agree
with the library operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import funnel
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable
from jobs.funnel_job import main as funnel_main
from test_streaming_funnel import DOCS_SCHEMA, _corpus


def test_funnel_job_batch_commits_both_tables(spark, tmp_path):
    docs = _corpus(spark)
    docs.write.parquet(str(tmp_path / "docs"))
    docs.where("doc_id = 1").write.parquet(str(tmp_path / "test"))

    funnel_main(["--input-table", str(tmp_path / "docs"),
                 "--output-root", str(tmp_path / "out"),
                 "--test-table", str(tmp_path / "test"),
                 "--run-id", "job-t"], stop_session=False)

    adm = SnapshotTable(str(tmp_path / "out/admitted")).read(spark)
    rep = {r["stage"]: r for r in
           SnapshotTable(str(tmp_path / "out/attrition")).read(spark).collect()}

    test_df = docs.where("doc_id = 1")
    verdicts = funnel.funnel_verdicts(docs, test_df)
    want_ids = {r["id"] for r in
                verdicts.where(F.col("rej_at").isNull()).collect()}
    assert {r["id"] for r in adm.collect()} == want_ids and want_ids
    # doc 1 is the held-out doc: keep-url, suffixed, well-compressed —
    # it reaches stage 5 and self-contaminates there
    assert "1" not in {str(i) for i in want_ids}
    assert rep["decontaminate"]["n_rejected"] >= 1
    want = {r["stage"]: r
            for r in funnel.quality_funnel(docs, test_df).collect()}
    for s in funnel.FUNNEL_STAGES:
        assert (rep[s]["n_in"], rep[s]["n_rejected"], rep[s]["n_out"]) == \
            (want[s]["n_in"], want[s]["n_rejected"], want[s]["n_out"]), s


def test_funnel_job_fused_impl_matches_ops(spark, tmp_path):
    docs = _corpus(spark)
    docs.write.parquet(str(tmp_path / "docs"))
    docs.where("doc_id = 1").write.parquet(str(tmp_path / "test"))

    for impl in ("ops", "fused"):
        funnel_main(["--input-table", str(tmp_path / "docs"),
                     "--output-root", str(tmp_path / impl),
                     "--test-table", str(tmp_path / "test"),
                     "--impl", impl,
                     "--run-id", f"job-{impl}"], stop_session=False)

    adm = {impl: {r["id"] for r in
                  SnapshotTable(str(tmp_path / impl / "admitted"))
                  .read(spark).collect()}
           for impl in ("ops", "fused")}
    rep = {impl: sorted(
        (r["stage_ord"], r["n_in"], r["n_rejected"], r["n_out"])
        for r in SnapshotTable(str(tmp_path / impl / "attrition"))
        .read(spark).collect())
        for impl in ("ops", "fused")}
    assert adm["fused"] == adm["ops"] and adm["ops"]
    assert rep["fused"] == rep["ops"]
