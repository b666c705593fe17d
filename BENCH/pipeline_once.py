"""One timed composed-pipeline run at a given parallelism level — helper
for run_pipeline_scaling.py.  Prints one JSON line
{cpus, n_pages, sec, docs_per_sec}.

Fairness controls mirror funnel_once.py: pre-materialized parquet pages
input, FIXED 64-way shuffle partitioning at both levels (identical task
graph — only concurrent slots differ), worker warmup through the SAME
code path (a small pipeline run over the warm slice) outside the timed
window.  The timed job is jobs/pipeline_job.main in --pages-table mode:
OCR/HTML extraction -> quality floor -> lang allowlist -> exact dedup ->
Jaccard-verified near-dup removal -> temperature mixture report ->
packed training shards, with every stage's SnapshotTable commit
included in the wall (the write path is part of the production job)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_pdf_ocr_suite_spark.session import build_session  # noqa: E402
from jobs.pipeline_job import main as pipeline_main  # noqa: E402


def _run(pages_path: str, root: str, run_id: str) -> None:
    if os.path.exists(root):
        shutil.rmtree(root)
    pipeline_main([
        "--pages-table", pages_path, "--output-root", root,
        "--run-id", run_id,
    ], stop_session=False)


def main(cpus: int, pages_path: str, warm_path: str) -> None:
    spark = build_session(app=f"pipeline-scaling-{cpus}",
                          master=f"local[{cpus}]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    n_pages = spark.read.parquet(pages_path).count()

    scratch = f"/tmp/pipe_scale_run_{cpus}_{os.getpid()}"
    _run(warm_path, f"{scratch}/warm", "warm")

    t0 = time.perf_counter()
    _run(pages_path, f"{scratch}/timed", "timed")
    sec = time.perf_counter() - t0
    print(json.dumps({
        "cpus": cpus, "n_pages": n_pages, "sec": round(sec, 3),
        "docs_per_sec": round(n_pages / sec, 2)}))
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], sys.argv[3])
