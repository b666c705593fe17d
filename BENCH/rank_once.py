"""One timed global-rank + orderBy-baseline run at a given parallelism
level — helper for run_rank_scaling.py.  Prints one JSON line
{cpus, n_rows, rank_sec, sort_sec, rank_rows_per_sec, sort_rows_per_sec}.

Fairness controls mirror export_once.py: pre-materialized parquet
input, FIXED range-partition count (64) at both levels (identical task
graph — only concurrent slots differ), worker warmup outside the timed
window.  Two jobs are timed back-to-back in the SAME JVM:

- ``sort``: Spark's own ``orderBy`` (global sort — the same range
  exchange machinery, no rank) — the host baseline the rank's scaling
  must be judged against;
- ``rank``: relational/globalrank.curriculum_shards — the range
  exchange + sortWithinPartitions pinned by a DISK_ONLY
  localCheckpoint, the bounded count pass, and the pure-Catalyst rank
  projection.

The rank/sort wall ratio is the primitive's true overhead (one extra
materialization); their EFFICIENCY ratio isolates what the rank adds
to however the host scales a sort."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from image_pdf_ocr_suite_spark.relational.globalrank import (  # noqa: E402
    curriculum_shards)
from image_pdf_ocr_suite_spark.session import build_session  # noqa: E402

def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main(cpus: int, rows_path: str) -> None:
    spark = build_session(app=f"rank-scaling-{cpus}",
                          master=f"local[{cpus}]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    rows = spark.read.parquet(rows_path)
    n_rows = rows.count()
    ORDER = [F.desc("n_tokens"), F.asc("doc_id")]  # needs a live session

    # warmup outside the timed window
    warm = rows.sample(0.02, seed=1)
    _force(warm.orderBy(*ORDER))
    _force(curriculum_shards(warm, ORDER, shard_size=4096, n_partitions=64,
                             checkpoint_storage=StorageLevel.DISK_ONLY))

    t0 = time.perf_counter()
    _force(rows.orderBy(*ORDER))
    sort_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    _force(curriculum_shards(rows, ORDER, shard_size=4096, n_partitions=64,
                             checkpoint_storage=StorageLevel.DISK_ONLY))
    rank_sec = time.perf_counter() - t0

    print(json.dumps({
        "cpus": cpus, "n_rows": n_rows,
        "sort_sec": round(sort_sec, 3), "rank_sec": round(rank_sec, 3),
        "sort_rows_per_sec": round(n_rows / sort_sec, 2),
        "rank_rows_per_sec": round(n_rows / rank_sec, 2)}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
