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


def _scanfloor_op(pages):
    # the irreducible floor under every pages-parse kernel: the same
    # column-pruned scan + Arrow boundary crossing, with a near-zero
    # Python body (byte length per row).  Adjudication baseline for
    # light kernels whose wall approaches this floor — the floor is
    # host-memory-bandwidth-bound and anti-scales in the shared local
    # JVM exactly like orderBy (CLAUDE.md round-5j rule).
    import pandas as pd

    cols = pages.columns

    def gen(batches):
        for pdf in batches:
            body = pdf[cols[-1]]
            yield pd.DataFrame({
                "url": pdf[cols[0]].astype(str),
                "n_bytes": body.map(lambda b: len(b) if b is not None
                                    else -1).astype("int64")})
    return pages.mapInPandas(gen, schema="url string, n_bytes long")


OPS = {"tables": table_rows_from_docs, "markdown": markdown_from_docs,
       "sentences": sentence_spans,
       # the scale form: offsets only, no corpus copy across Arrow
       "sentences_meta": lambda df: sentence_spans(df,
                                                   include_text=False),
       "microdata": _microdata_op, "sections": _sections_op,
       "scanfloor": _scanfloor_op}


def main(cpus: int, docs_path: str, op: str = "tables") -> None:
    kernel = OPS[op]
    spark = build_session(app=f"{op}-scaling-{cpus}",
                          master=f"local[{cpus}]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    # one scan partition per input file (the materializer wrote 64):
    # openCost == maxPartitionBytes means the packer can never fit two
    # files in one partition, so the task graph is pinned WITHOUT a
    # corpus-sized repartition shuffle inside the timed window — the
    # production plan is scan -> kernel, no Exchange, and a body
    # shuffle is itself an anti-scaling memory-bandwidth stage that
    # drowned the light kernels' compute signal (sections 0.667 at
    # 800x with the old in-window repartition(64)).
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 << 20))
    docs = spark.read.parquet(docs_path)
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
