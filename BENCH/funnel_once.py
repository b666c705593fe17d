"""One timed quality-funnel run at a given parallelism level — helper
for run_funnel_scaling.py.  Prints one JSON line
{cpus, n_docs, sec, docs_per_sec}.

Fairness controls mirror extract_once.py: pre-materialized parquet
input, FIXED shuffle partitioning (64) at both levels (identical task
graph — only concurrent slots differ), worker warmup outside the timed
window.  The timed job is the full composed funnel: five gates +
decontamination against a ~1/5000 held-out slice + the attribution
shuffle + the attrition fold."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from image_pdf_ocr_suite_spark.analytics import funnel  # noqa: E402
from image_pdf_ocr_suite_spark.session import build_session  # noqa: E402


def main(cpus: int, docs_path: str) -> None:
    impl = os.environ.get("FUNNEL_IMPL", "ops")
    spark = build_session(app=f"funnel-scaling-{cpus}",
                          master=f"local[{cpus}]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    test = docs.where(F.col("doc_id") % 4999 == 0)

    warm = funnel.quality_funnel(
        docs.sample(0.05, seed=1).repartition(cpus * 2), test_df=test,
        impl=impl)
    warm.write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    funnel.quality_funnel(docs, test_df=test, impl=impl) \
        .write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    print(json.dumps({
        "cpus": cpus, "n_docs": n_docs, "sec": round(sec, 3),
        "impl": impl, "docs_per_sec": round(n_docs / sec, 2)}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
