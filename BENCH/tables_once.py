"""One timed HTML-table-extraction run at a given parallelism level —
helper for run_tables_scaling.py.  Prints one JSON line
{cpus, n_docs, sec, docs_per_sec}.

Fairness controls mirror funnel_once.py: pre-materialized parquet
input, FIXED shuffle partitioning (64) at both levels (identical task
graph — only concurrent slots differ), worker warmup outside the timed
window.  The timed job is the fused synth+parse table kernel
(kernels/htmltables.table_rows_from_docs) — map-only, no shuffle: the
purest test of Python-kernel-stage scaling in the operator family."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_pdf_ocr_suite_spark.analytics.sentences import (  # noqa: E402
    sentence_spans)
from image_pdf_ocr_suite_spark.kernels.htmltables import (  # noqa: E402
    table_rows_from_docs)
from image_pdf_ocr_suite_spark.kernels.markdown import (  # noqa: E402
    markdown_from_docs)
from image_pdf_ocr_suite_spark.session import build_session  # noqa: E402

def _microdata_op(pages):
    # input is PRE-MATERIALIZED (url, html) pages parquet (the
    # production shape — run_tables_scaling materializes the
    # deterministic synthesis once, outside the timed window): the
    # timed job is scan -> parse kernel only
    from image_pdf_ocr_suite_spark.kernels.microdata import (
        extract_microdata)
    return extract_microdata(pages)


def _sections_op(pages):
    from image_pdf_ocr_suite_spark.analytics.sections import section_chunks
    return section_chunks(pages)


OPS = {"tables": table_rows_from_docs, "markdown": markdown_from_docs,
       "sentences": sentence_spans,
       # the scale form: offsets only, no corpus copy across Arrow
       "sentences_meta": lambda df: sentence_spans(df,
                                                   include_text=False),
       "microdata": _microdata_op, "sections": _sections_op}


def main(cpus: int, docs_path: str, op: str = "tables") -> None:
    kernel = OPS[op]
    spark = build_session(app=f"{op}-scaling-{cpus}",
                          master=f"local[{cpus}]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(docs_path).repartition(64)
    n_docs = docs.count()

    warm = kernel(docs.sample(0.05, seed=1).repartition(cpus * 2))
    warm.write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    kernel(docs).write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    print(json.dumps({
        "cpus": cpus, "n_docs": n_docs, "sec": round(sec, 3),
        "docs_per_sec": round(n_docs / sec, 2), "op": op}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else "tables")
