"""PQ / IVF-PQ scale evidence: the ADC scan-byte story measured.

Synthesizes a DETERMINISTIC corpus of n 64-dim float32 vectors entirely
in Spark (per-row seeded numpy inside an Arrow kernel — no driver-side
data), materializes three serving layouts, and times one top-10 query
against each on the same session:

- ``exact``   — brute-force cosine over the raw embedding column
                (the flat baseline every ANN path is judged against),
- ``pq_adc``  — flat PQ-ADC over the materialized code table
                (column pruning: the scan reads 8-byte codes, never the
                256-byte vectors) + exact rerank of the top 100,
- ``ivfpq``   — the composed index (PartitionFilters × code column,
                n_probe=4 of n_lists=16) + the same rerank.

Also records the PHYSICAL bytes each query's scan can touch (parquet
footprint of the columns/partitions involved) — the number that scales
to 100 TB: wall times on a 32-thread local JVM flatten once the scan
fits in page cache, but the bytes ratio is the cluster-side I/O ratio.

Recall sanity: each approximate result's overlap with the exact top-10
is printed (rerank=100); the run is evidence, not a correctness gate —
correctness is the driver row's oracle.

Usage: python BENCH/run_pq_scale.py [n_vectors] [cpus]
Defaults: 500_000 vectors, 32 cpus.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from image_pdf_ocr_suite_spark.analytics import ivfpq, pq, similarity  # noqa: E402
from image_pdf_ocr_suite_spark.session import build_session  # noqa: E402

DIM = 64


def synth_vectors(spark, n: int):
    """Deterministic clustered vectors: 64 seeded cluster centers, each
    row = center(id % 64) + small seeded noise — realistic-ish cluster
    structure so IVF lists are non-degenerate."""
    import pandas as pd

    centers = np.random.RandomState(7).standard_normal((64, DIM)) * 3.0

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), DIM), dtype=np.float32)
            for k, i in enumerate(ids):
                rng = np.random.RandomState(int(i) % 100003)
                out[k] = centers[int(i) % 64] + rng.standard_normal(DIM)
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": [row.tolist() for row in out]})

    return spark.range(n).repartition(64).mapInPandas(
        gen, schema="vec_id long, embedding array<float>")


def du(path_glob: str) -> int:
    return sum(os.path.getsize(p)
               for p in glob.glob(path_glob, recursive=True)
               if os.path.isfile(p))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = build_session(app="pq_scale", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    base = f"/tmp/pq_scale_{n}"
    raw_path = f"{base}/raw"
    if not os.path.isdir(raw_path):
        synth_vectors(spark, n).write.mode("overwrite").parquet(raw_path)
    emb = spark.read.parquet(raw_path)
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0)
            .select("embedding").head()[0]]

    # ---- build layouts (untimed: indexes amortize over many queries) ----
    # The driver-gate config (16 codes/subspace) is sized for the
    # 500-vector oracle fixture; the standard production operating point
    # is 256 codes/subspace (PQ8x8 → 64-bit codes) with a bigger
    # training sample — same code paths, numpy quantizers.
    pq_path, ivfpq_path = f"{base}/pq", f"{base}/ivfpq"
    t0 = time.perf_counter()
    books = pq.train_pq(emb, m_sub=8, n_codes=256, sample=16384)
    t_train = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    if not os.path.isdir(pq_path):
        pq.pq_write_index(emb, pq_path, codebooks=books)
    t_build_pq = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    if not os.path.isdir(ivfpq_path):
        ivfpq.ivfpq_write_index(emb, ivfpq_path, n_lists=16,
                                codebooks=books, coarse_impl="numpy")
    t_build_ivfpq = round(time.perf_counter() - t0, 1)

    exact_ids = None
    results = {}

    def leg(name, fn, reps=3):
        times = []
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            times.append(round(time.perf_counter() - t0, 3))
        results[name] = {"best_s": min(times), "reps": times}
        return out

    exact_rows = leg("exact", lambda: similarity.cosine_topk(
        emb, qvec, k=10).collect())
    exact_ids = {r[0] for r in exact_rows}

    pq_rows = leg("pq_adc", lambda: pq.pq_topk_from_index(
        spark, pq_path, qvec, k=10, rerank=1000).collect())
    results["pq_adc"]["recall@10"] = len(
        {r[0] for r in pq_rows} & exact_ids) / 10

    ivfpq_rows = leg("ivfpq", lambda: ivfpq.ivfpq_topk(
        spark, ivfpq_path, qvec, k=10, n_probe=4, rerank=1000).collect())
    results["ivfpq"]["recall@10"] = len(
        {r[0] for r in ivfpq_rows} & exact_ids) / 10

    # ---- physical bytes each scan can touch ----
    # raw: the whole embedding table; pq_adc: the code table footprint
    # minus its vector column is not separable at file level, so report
    # the CODES-ONLY columnar size via a codes-only rewrite; ivfpq: the
    # probed partitions' files.
    codes_only = f"{base}/codes_only"
    if not os.path.isdir(codes_only):
        spark.read.parquet(pq_path).select("vec_id", "code") \
            .write.mode("overwrite").parquet(codes_only)
    cent, _ = ivfpq.ivfpq_read_sidecars(ivfpq_path)
    probe = similarity._probe_lists(cent, qvec, 4)
    probed_bytes = sum(du(f"{ivfpq_path}/ivf_list={p}/**") for p in probe)
    # scale probed bytes by the codes share of a row group (codes-only
    # size / full index size) to approximate the column-pruned read
    full_ivfpq = du(f"{ivfpq_path}/**")
    codes_share = du(f"{codes_only}/**") / max(1, du(f"{pq_path}/**"))
    bytes_info = {
        "raw_table_bytes": du(f"{raw_path}/**"),
        "codes_only_bytes": du(f"{codes_only}/**"),
        "ivfpq_probed_partition_bytes": probed_bytes,
        "ivfpq_probed_codes_bytes_est": int(probed_bytes * codes_share),
        "ivfpq_full_bytes": full_ivfpq,
    }

    print(json.dumps({
        "n_vectors": n, "cpus": cpus, "dim": DIM,
        "build_s": {"train": t_train, "pq": t_build_pq,
                    "ivfpq": t_build_ivfpq},
        "legs": results, "bytes": bytes_info,
        "io_ratio_vs_exact": {
            "pq_adc": round(bytes_info["raw_table_bytes"]
                            / max(1, bytes_info["codes_only_bytes"]), 1),
            "ivfpq": round(bytes_info["raw_table_bytes"]
                           / max(1, bytes_info[
                               "ivfpq_probed_codes_bytes_est"]), 1),
        }}))
    spark.stop()


if __name__ == "__main__":
    main()
