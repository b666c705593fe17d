"""Giant-document skew evidence (north_star: "giant scanned lecture PDFs").

One 2000-page document among ~500 one-to-three-page documents is ~2/3 of
the corpus' total OCR work.  Without page-level explode, that document is
a single task — the job's wall clock degenerates to one core's throughput
no matter how many executors exist.  With the salted page-explode
(pipeline.py: repartition on xxhash64(url, page) AFTER the decode kernel
splits documents into per-page payloads), its 2000 pages spread across
every slot and the long-pole task stays bounded by pages-per-slot.

This harness measures both plans on the same skewed input at the same
parallelism and appends the numbers to BENCH/BASELINE.md.

Usage: python BENCH/run_skew.py [sf_dir] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from image_pdf_ocr_suite_spark import ExtractConfig, extract_pages  # noqa: E402
from image_pdf_ocr_suite_spark.fixtures import build_pages_df  # noqa: E402
from image_pdf_ocr_suite_spark.session import build_session  # noqa: E402

GIANT_PAGES = int(os.environ.get("SKEW_GIANT_PAGES", "2000"))
RUNS = int(os.environ.get("SKEW_RUNS", "2"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = build_session(app="skew-bench", master=f"local[{cpus}]",
                          shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")

    # skewed input: doc 0 carries GIANT_PAGES pages, everyone else 1-3
    # (cache key includes the corpus tag so switching sf_dir never reuses
    # the previous corpus' materialized pages)
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = f"/tmp/skew_pages_{sf_tag}_{GIANT_PAGES}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build_pages_df(spark, sf_dir, giant_doc_id=0,
                       giant_pages=GIANT_PAGES) \
            .write.mode("overwrite").parquet(path)
    pages = spark.read.parquet(path)
    n_docs = pages.count()

    def timed(cfg: ExtractConfig) -> float:
        best = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            res = extract_pages(pages, cfg, run_id="skew")
            res.text.write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
            res.unpersist()
            best = sec if best is None else min(best, sec)
        return round(best, 3)

    # warmup both plans once (worker spin-up out of the timed window)
    for flag in (True, False):
        res = extract_pages(pages.limit(cpus * 8),
                            ExtractConfig(explode_pages=flag), run_id="warm")
        res.text.write.format("noop").mode("overwrite").save()
        res.unpersist()

    exploded = timed(ExtractConfig(explode_pages=True))
    pinned = timed(ExtractConfig(explode_pages=False))
    result = {
        "metric": "skew_explode_speedup",
        "value": round(pinned / exploded, 2),
        "unit": "x",
        "wall_exploded_sec": exploded,
        "wall_pinned_sec": pinned,
        "giant_pages": GIANT_PAGES,
        "n_docs": n_docs,
        "cpus": cpus,
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(result))
    spark.stop()

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "a") as fh:
        fh.write(f"""
## Giant-document skew (BENCH/run_skew.py)

Skewed corpus: one {GIANT_PAGES}-page document among {n_docs - 1}
one-to-three-page documents ({sf_dir}), local[{cpus}],
best-of-{RUNS} walls.

| plan | wall sec |
|---|---|
| page-explode + xxhash64(url, page) repartition (default) | {exploded} |
| document-level partitioning (giant doc pins one task) | {pinned} |

Page-explode keeps the long-pole task bounded: **{result['value']}×**
faster on this skew shape, and the gap grows linearly with giant-document
size — at 100 TB the pinned plan's wall clock is one core's throughput on
the largest document.  Measured {result['measured_at']}.
""")


if __name__ == "__main__":
    main()
