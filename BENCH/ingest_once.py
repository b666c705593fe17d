"""One timed crawl-ingest run at a given parallelism level — helper for
run_ingest_scale.py.  Prints one JSON line {cpus, n_pages, sec,
pages_per_sec}.

Fairness controls mirror extract_once.py: the archive table is
pre-materialized parquet, shuffle partitioning is FIXED (64) at both
levels so both runs schedule identical tasks — only the concurrent task
slots differ."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_pdf_ocr_suite_spark.session import build_session  # noqa: E402
from jobs.crawl_ingest_job import ingest_pages  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main(cpus: int, archives_path: str) -> None:
    spark = build_session(app=f"ingest-scale-{cpus}",
                          master=f"local[{cpus}]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    archives = spark.read.parquet(archives_path)

    # warmup: touch every worker slot (python spin-up + imports must not
    # land inside the timed window)
    warm, _ = ingest_pages(archives.sample(0.05, seed=1)
                           .repartition(cpus * 2))
    _force(warm)

    n_pages = archives.count()                 # one blob = one page
    t0 = time.perf_counter()
    pages, rejects = ingest_pages(archives)
    _force(pages)
    sec = time.perf_counter() - t0

    print(json.dumps({"cpus": cpus, "n_pages": n_pages,
                      "sec": round(sec, 3),
                      "pages_per_sec": round(n_pages / sec, 2)}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
