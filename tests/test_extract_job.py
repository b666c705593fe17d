"""extract_job --mode all must execute the OCR kernel exactly once per
page row (staged-table derivation), and its four outputs must match the
direct pipeline results."""

import pytest

from image_pdf_ocr_suite_spark import fixtures
from image_pdf_ocr_suite_spark.config import ExtractConfig
from image_pdf_ocr_suite_spark.kernels import ocr as ocr_mod
from image_pdf_ocr_suite_spark.pipeline import extract_pages
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable
from jobs.extract_job import run as run_job

DOC_ROWS = [(i, " ".join(f"e{i}_{j}" for j in range(12)), "ja") for i in range(20)]


@pytest.fixture()
def counted_kernel(spark, monkeypatch):
    """Wrap make_extract_kernel so an accumulator counts every page row
    the OCR kernel actually receives (worker-side, Arrow batches)."""
    acc = spark.sparkContext.accumulator(0)
    real = ocr_mod.make_extract_kernel

    def counting(cfg):
        kern = real(cfg)

        def wrapped(batches):
            def gen():
                for pdf in batches:
                    acc.add(len(pdf))
                    yield pdf
            return kern(gen())
        return wrapped

    monkeypatch.setattr(ocr_mod, "make_extract_kernel", counting)
    return acc


def test_mode_all_runs_ocr_once(spark, tmp_path, counted_kernel):
    input_dir = str(tmp_path / "in")
    out_root = str(tmp_path / "out")
    pdf = fixtures.build_pages_pdf(DOC_ROWS)
    spark.createDataFrame(pdf).write.parquet(input_dir)

    run_id = run_job(spark, input_dir, out_root, mode="all", run_id="job1")
    assert run_id == "job1"

    staged = SnapshotTable(f"{out_root}/_staged_pages/job1").read(spark)
    n_staged = staged.count()
    assert n_staged > 0
    # the kernel saw each page row exactly once — not once per output
    assert counted_kernel.value == n_staged

    # outputs complete and identical to the direct single-pass pipeline
    text = SnapshotTable(f"{out_root}/text").read(spark)
    spans = SnapshotTable(f"{out_root}/spans").read(spark)
    quar = SnapshotTable(f"{out_root}/quarantine").read(spark)
    metrics = SnapshotTable(f"{out_root}/metrics").read(spark)

    res = extract_pages(spark.read.parquet(input_dir), ExtractConfig(),
                        run_id="ref")
    expected_text = {(r["url"], r["extracted_text"]) for r in res.text.collect()}
    assert {(r["url"], r["extracted_text"]) for r in text.collect()} == expected_text
    assert spans.count() == res.spans.count()
    assert {r["url"] for r in quar.collect()} == \
        {r["url"] for r in res.quarantine.collect()}
    assert metrics.count() > 0


def test_mode_all_restart_same_run_id_is_idempotent(spark, tmp_path):
    """Re-running --mode all with the same --run-id (crash-restart path)
    must not re-stage, re-append, or duplicate any rows."""
    input_dir = str(tmp_path / "in")
    out_root = str(tmp_path / "out")
    spark.createDataFrame(fixtures.build_pages_pdf(DOC_ROWS)) \
        .write.parquet(input_dir)

    run_job(spark, input_dir, out_root, mode="all", run_id="rr")
    stage = SnapshotTable(f"{out_root}/_staged_pages/rr")
    n_staged = stage.read(spark).count()
    text1 = SnapshotTable(f"{out_root}/text").read(spark).collect()

    run_job(spark, input_dir, out_root, mode="all", run_id="rr")
    assert stage.read(spark).count() == n_staged          # no second snapshot
    text2 = SnapshotTable(f"{out_root}/text").read(spark).collect()
    assert sorted(r["url"] for r in text2) == sorted(r["url"] for r in text1)
    urls = [r["url"] for r in text2]
    assert len(urls) == len(set(urls))


def test_mode_text_and_pdf_paths(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    spark.createDataFrame(fixtures.build_pages_pdf(DOC_ROWS)) \
        .write.parquet(input_dir)

    out_t = str(tmp_path / "out_text")
    run_job(spark, input_dir, out_t, mode="text", run_id="t")
    assert SnapshotTable(f"{out_t}/text").read(spark).count() > 0
    assert SnapshotTable(f"{out_t}/quarantine").read(spark).count() > 0
    assert SnapshotTable(f"{out_t}/metrics").read(spark).count() > 0

    out_p = str(tmp_path / "out_pdf")
    run_job(spark, input_dir, out_p, mode="pdf", run_id="p")
    pdfs = SnapshotTable(f"{out_p}/pdf").read(spark)
    assert pdfs.count() > 0
    assert {f.name for f in pdfs.schema.fields} == {"url", "pdf", "n_pages"}


def test_resume_skips_committed_urls(spark, tmp_path, counted_kernel):
    """--resume: urls already committed to text or quarantine are not
    re-extracted — the kernel sees only the NEW pages."""
    input_half = str(tmp_path / "in_half")
    input_full = str(tmp_path / "in_full")
    out_root = str(tmp_path / "out")
    pdf = fixtures.build_pages_pdf(DOC_ROWS)
    spark.createDataFrame(pdf.iloc[:10]).write.parquet(input_half)
    spark.createDataFrame(pdf).write.parquet(input_full)

    run_job(spark, input_half, out_root, mode="all", run_id="r1")
    first_kernel_rows = counted_kernel.value
    n1 = SnapshotTable(f"{out_root}/text").read(spark).count()

    run_job(spark, input_full, out_root, mode="all", resume=True, run_id="r2")
    second_kernel_rows = counted_kernel.value - first_kernel_rows
    # second run OCRs only the 10 new docs' pages, not all 20
    assert 0 < second_kernel_rows < first_kernel_rows * 2
    staged2 = SnapshotTable(f"{out_root}/_staged_pages/r2").read(spark)
    assert second_kernel_rows == staged2.count()

    text = SnapshotTable(f"{out_root}/text").read(spark)
    urls = [r["url"] for r in text.select("url").collect()]
    assert len(urls) == len(set(urls))          # no double extraction
    assert text.count() > n1                    # new docs arrived
