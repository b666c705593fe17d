"""Inverted-index scale evidence: the posting-probe I/O story measured.

Synthesizes a DETERMINISTIC corpus of n documents entirely in Spark
(per-row seeded word ids inside an Arrow kernel — no driver-side data),
materializes the raw document table and the inverted-index layout, and
times one 4-term BM25 query against each on the same session:

- ``full_scan`` — ``text.bm25_scores`` over the raw text column (the
  operator every query pays without an index),
- ``index_probe`` — ``lexindex.bm25_from_index`` over the materialized
  posting layout (PartitionFilters prune to the probed term buckets,
  term equality pushed into the scan).

Also records the PHYSICAL bytes each query's scan can touch (parquet
footprint of the raw text column vs the probed bucket partitions) —
the number that scales to 100 TB: wall times on a 32-thread local JVM
flatten once the scan fits in page cache, but the bytes ratio is the
cluster-side I/O ratio.

Correctness sanity: the probe's hit set must equal the full scan's
``n_terms_hit >= 1`` rows with bit-identical scores (asserted on the
full result — the same law tests/test_lexindex.py pins at pytest
scale).

Usage: python BENCH/run_lex_scale.py [n_docs] [cpus]
Defaults: 2_000_000 docs, 32 cpus.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from image_pdf_ocr_suite_spark.analytics import lexindex  # noqa: E402
from image_pdf_ocr_suite_spark.analytics import text as textops  # noqa: E402
from image_pdf_ocr_suite_spark.session import build_session  # noqa: E402

TERMS = ["hash", "join", "filter", "zebra"]
N_BUCKETS = 64
VOCAB = 50021          # prime: the long-tail pseudo-word space
WORDS_PER_DOC = 40


def synth_docs(spark, n: int):
    """Deterministic Zipf-ish corpus: word j of doc i is
    ``w{(i*41 + j*7) % VOCAB}``; docs divisible by 13/17/23/97 carry
    one query term each ('hash'/'join'/'filter'/'zebra') so the hit
    set is real but sparse."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                words = [f"w{(i * 41 + j * 7) % VOCAB}"
                         for j in range(WORDS_PER_DOC)]
                if i % 13 == 0:
                    words[3] = "hash"
                if i % 17 == 0:
                    words[11] = "join"
                if i % 23 == 0:
                    words[19] = "filter"
                if i % 97 == 0:
                    words[27] = "zebra"
                texts.append(" ".join(words))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(n).mapInPandas(kernel,
                                      "doc_id bigint, text string")


def du(pattern: str) -> int:
    return sum(os.path.getsize(p) for p in glob.glob(pattern, recursive=True)
               if os.path.isfile(p))


def main(n: int, cpus: int) -> None:
    spark = build_session(app="lex-scale", master=f"local[{cpus}]",
                          shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    root = f"/tmp/lex_scale_{n}"
    raw_path = f"{root}/docs"
    idx_path = f"{root}/index"

    if not os.path.exists(os.path.join(raw_path, "_SUCCESS")):
        synth_docs(spark, n).repartition(64).write \
            .mode("overwrite").parquet(raw_path)
    docs = spark.read.parquet(raw_path)

    t0 = time.perf_counter()
    if not os.path.exists(os.path.join(idx_path, lexindex._STATS_FILE)):
        lexindex.write_inverted_index(docs, idx_path, n_buckets=N_BUCKETS)
    build_sec = time.perf_counter() - t0

    # warm both paths once (JVM/codegen), then time
    textops.bm25_scores(docs.limit(1000), TERMS).count()
    lexindex.bm25_from_index(spark, idx_path, TERMS).count()

    t0 = time.perf_counter()
    full = textops.bm25_scores(docs, TERMS).where("n_terms_hit >= 1")
    n_full = full.count()
    full_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    probe = lexindex.bm25_from_index(spark, idx_path, TERMS)
    n_probe = probe.count()
    probe_sec = time.perf_counter() - t0

    # bit-identity of the whole hit set (anti-join both directions on
    # the exact double score)
    mism = (full.select("doc_id", "n_terms_hit", "score")
            .exceptAll(probe.select("doc_id", "n_terms_hit", "score"))
            .count())
    assert n_full == n_probe and mism == 0, (n_full, n_probe, mism)

    buckets = sorted({lexindex.term_bucket(t, N_BUCKETS) for t in TERMS})
    probed_bytes = sum(du(f"{idx_path}/bucket={b}/**") for b in buckets)
    result = {
        "metric": "lex_index_probe_vs_full_scan",
        "n_docs": n, "cpus": cpus, "n_hit_docs": n_full,
        "build_sec": round(build_sec, 2),
        "full_scan_sec": round(full_sec, 2),
        "index_probe_sec": round(probe_sec, 2),
        "wall_ratio": round(full_sec / probe_sec, 2),
        "raw_table_bytes": du(f"{raw_path}/**"),
        "index_total_bytes": du(f"{idx_path}/**"),
        "probed_bucket_bytes": probed_bytes,
        "io_ratio_vs_full_scan": round(du(f"{raw_path}/**")
                                       / max(probed_bytes, 1), 1),
        "probed_buckets": f"{len(buckets)}/{N_BUCKETS}",
        "load1": round(os.getloadavg()[0], 2),
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(result), flush=True)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 32)
