"""Two-cluster-size scaling for the crawl-ingest job (north_rule
evidence for the UPSTREAM half of the corpus path).

Same methodology as run_scaling.py (read its docstring): N and 4N task
slots in fresh JVMs, slots <= cores/2 at both levels, PAIRED
back-to-back legs, efficiency = median per-pair
throughput(4N)/(4×throughput(N)).

The measured job is jobs/crawl_ingest_job.ingest_pages: WARC record
walk → status filter → latest-crawl window → fused charset-decode +
density-strip Arrow kernel → script lang-ID.  Map-dominated with one
url-keyed window shuffle — the shape that must scale linearly for the
10^12-document tier.

Input synthesis (deterministic, reused across runs): one archive blob
per page, built by the Catalyst record writer over the sf documents
table replicated INGEST_REPLICATES× with distinct urls; bodies are
~1-2 KB HTML with boilerplate so the density strip does real work.

Usage: python BENCH/run_ingest_scale.py [sf_dir]
Env: INGEST_N (default 4), INGEST_RUNS (default 2),
     INGEST_REPLICATES (default 16 ≈ 80k pages at sf0.1).
Appends a dated section to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CPUS = int(os.environ.get("INGEST_N", "4"))
N4_CPUS = 4 * N_CPUS
RUNS = int(os.environ.get("INGEST_RUNS", "2"))
REPLICATE = int(os.environ.get("INGEST_REPLICATES", "16"))


def _materialize_archives(sf_dir: str) -> str:
    from pyspark.sql import functions as F

    from image_pdf_ocr_suite_spark.session import build_session
    from image_pdf_ocr_suite_spark.tableio.warc import warc_record_expr

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = f"/tmp/scaling_archives_{tag}_x{REPLICATE}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    spark = build_session(app="ingest-scale-prep", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    d = d.crossJoin(spark.range(REPLICATE).withColumnRenamed("id", "rep"))
    n = F.concat(F.col("doc_id").cast("string"), F.lit("r"),
                 F.col("rep").cast("string"))
    body = F.concat(
        F.lit("<html><head><title>t</title><script>var x=1;</script>"
              "</head><body><nav><a href='/a'>a</a> <a href='/b'>b</a>"
              "</nav><p>"),
        F.col("text"),
        F.lit("</p><footer>footer boilerplate links terms privacy"
              "</footer></body></html>"))
    docs = d.select(
        F.concat(F.lit("https://scale.example/"), n).alias("uri"),
        F.lit("2026-03-01T00:00:00Z").alias("dt"), body.alias("body"))
    rec = warc_record_expr("uri", "dt", "body")
    docs.select(F.encode(rec, "UTF-8").alias("warc")) \
        .repartition(64).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def _run_once(cpus: int, path: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "BENCH", "ingest_once.py"),
         str(cpus), path],
        capture_output=True, text=True, cwd=REPO, timeout=3600)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    path = _materialize_archives(sf_dir)
    pairs = []
    for _ in range(RUNS):
        r_n = _run_once(N_CPUS, path)
        r_4n = _run_once(N4_CPUS, path)
        pairs.append({"n": r_n, "n4": r_4n,
                      "eff": round(r_4n["pages_per_sec"]
                                   / (4.0 * r_n["pages_per_sec"]), 3)})
    effs = sorted(p["eff"] for p in pairs)
    eff = effs[len(effs) // 2]
    best = max(pairs, key=lambda p: p["n"]["pages_per_sec"])
    result = {
        "metric": "ingest_scaling_efficiency_N_to_4N",
        "value": eff, "unit": "ratio", "pair_efficiencies": effs,
        "replicate": REPLICATE, "n": best["n"], "n4": best["n4"],
        "sf_dir": sf_dir, "pass_0_8_gate": eff >= 0.8,
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(result), flush=True)

    rows = "\n".join(
        f"| {lvl} | {r['cpus']} | {r['sec']} | {r['pages_per_sec']} |"
        for lvl, r in (("N", best["n"]), ("4N", best["n4"])))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
        fh.write(f"""

## Crawl-ingest scaling run {result['measured_at']}

jobs/crawl_ingest_job.ingest_pages over {best['n']['n_pages']} archive
blobs ({REPLICATE}x {sf_dir}), fixed 64-way task graph, {RUNS}
interleaved pairs, slots <= cores/2 at both levels.

| level | cores | wall sec | pages/sec |
|---|---|---|---|
{rows}

**Scaling efficiency** = throughput(4N) / (4 × throughput(N)):
**{eff}** (pairs: {effs}; gate >= 0.8 → {"PASS" if eff >= 0.8 else "FAIL"})
""")


if __name__ == "__main__":
    main()
