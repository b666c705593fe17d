"""The spark-submit --py-files deployment path, driven for real: build
pkg.zip, copy the job script into an empty directory, and run
``spark-submit --py-files pkg.zip extract_job.py`` from there — the
engine must import from the archive, not from the repo tree."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def test_pyfiles_archive_is_deterministic(tmp_path):
    sys.path.insert(0, REPO)
    from make_pyfiles import build_pyfiles

    z1 = build_pyfiles(str(tmp_path / "a.zip"))
    z2 = build_pyfiles(str(tmp_path / "b.zip"))
    assert open(z1, "rb").read() == open(z2, "rb").read()
    names = set(zipfile.ZipFile(z1).namelist())
    assert "image_pdf_ocr_suite_spark/pipeline.py" in names
    assert "jobs/__init__.py" in names          # injected package marker
    assert "jobs/extract_job.py" in names
    assert not any("__pycache__" in n for n in names)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_runs_extract_job(spark, tmp_path):
    sys.path.insert(0, REPO)
    from image_pdf_ocr_suite_spark.fixtures import build_pages_df
    from make_pyfiles import build_pyfiles

    pages = str(tmp_path / "pages")
    build_pages_df(spark, "/root/testdata/sf0.001", limit=40) \
        .write.parquet(pages)
    pkg = build_pyfiles(str(tmp_path / "pkg.zip"))
    # the job script is copied OUT of the repo: only --py-files can
    # satisfy its imports (cwd is also outside the repo)
    script = str(tmp_path / "extract_job.py")
    shutil.copyfile(os.path.join(REPO, "jobs", "extract_job.py"), script)

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", pkg, script,
         "--input-table", pages,
         "--output-root", str(tmp_path / "out"),
         "--mode", "text", "--run-id", "zip1"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]

    import duckdb
    n = duckdb.sql(
        f"select count(*) from '{tmp_path}/out/text/data/*/*.parquet'"
    ).fetchone()[0]
    # 40 docs at sf0.001: doc_ids 11/17 hit the %29 quarantine kinds
    # (encrypted at 11, corrupt at 17 — fixtures.py dispatch), 38 texts
    assert n == 38
