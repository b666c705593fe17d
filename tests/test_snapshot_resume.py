"""Snapshot-checkpoint idempotent resume (north_rule): kill-and-resume
mid-job recovers with no dupes and no gaps; uncommitted data is invisible."""

import pytest

from image_pdf_ocr_suite_spark import fixtures
from image_pdf_ocr_suite_spark.config import ExtractConfig
from image_pdf_ocr_suite_spark.pipeline import extract_pages
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable

DOC_ROWS = [(i, " ".join(f"w{i}_{j}" for j in range(12)), "ja") for i in range(20)]


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(fixtures.build_pages_pdf(DOC_ROWS))


def _run(df):
    return extract_pages(df, ExtractConfig(), run_id="resume-test").text \
        .select("url", "extracted_text", "n_pages")


def test_resume_no_dupes_no_gaps(spark, corpus, tmp_path):
    table = SnapshotTable(str(tmp_path / "out"))
    full = {r["url"]: r["extracted_text"] for r in _run(corpus).collect()}

    # job 1: process half the input, commit snapshot 1
    first_half = corpus.where("url < 'https://example.com/doc/00000010'")
    table.append(_run(first_half), run_id="job1")

    # job 1 crashes mid-write: some rows written but never committed
    orphan_rows = _run(corpus.where("url >= 'https://example.com/doc/00000015'"))
    table.write_uncommitted(orphan_rows, run_id="job1")

    # readers never see uncommitted data
    seen = table.read(spark)
    assert seen.count() == len([u for u in full if u < "https://example.com/doc/00000010"])

    # job 2 resumes: input minus committed keys
    remaining = table.remaining_input(corpus, "url")
    rem_urls = {r["url"] for r in remaining.select("url").collect()}
    assert all(u >= "https://example.com/doc/00000010" for u in rem_urls)
    table.append(_run(remaining), run_id="job2")

    final = table.read(spark)
    rows = final.collect()
    urls = [r["url"] for r in rows]
    assert sorted(urls) == sorted(full)                 # no gaps
    assert len(urls) == len(set(urls))                  # no dupes
    got = {r["url"]: r["extracted_text"] for r in rows}
    assert got == full                                  # identical content


def test_resume_is_idempotent_when_nothing_remains(spark, corpus, tmp_path):
    table = SnapshotTable(str(tmp_path / "out"))
    table.append(_run(corpus), run_id="job1")
    remaining = table.remaining_input(corpus, "url")
    # quarantined docs (encrypted id 11, corrupt id 17) produce no text row,
    # so a resume correctly retries exactly those and nothing else —
    # production commits the quarantine table alongside to settle them.
    rem = {r["url"] for r in remaining.select("url").collect()}
    assert rem == {fixtures.url_for(11), fixtures.url_for(17)}
    assert len(table.snapshots()) == 1


def test_snapshot_lineage(spark, corpus, tmp_path):
    table = SnapshotTable(str(tmp_path / "out"))
    s1 = table.append(_run(corpus.limit(3)), run_id="a")
    s2 = table.append(_run(corpus.limit(5)), run_id="b")
    assert s2.parent_id == s1.snapshot_id
    assert table.current_snapshot().snapshot_id == s2.snapshot_id
