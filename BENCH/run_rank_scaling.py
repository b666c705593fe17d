"""N vs 4N scaling evidence for the distributed global rank
(relational/globalrank.curriculum_shards) — the total-order primitive
whose only data-sized movement is ONE range exchange.

Methodology is run_scaling.py's verbatim (CLAUDE.md measurement rules):
PAIRED legs inside one noise window (fresh JVM each), slots <= cores/2
at both levels, median of per-pair ratios, corpus sized to amortize
the ~4-5 s per-job fixed costs.  Input = (doc_id, n_tokens) rows
synthesized deterministically once to parquet (heavy integer key ties
+ unique tiebreaker — the worst case for a range sort), so the timed
job measures the rank, not synthesis.  n_partitions is fixed at 64 at
both levels (identical task graph).

Usage: SCALING_N=4 python BENCH/run_rank_scaling.py [n_rows]
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

N_CPUS = int(os.environ.get("SCALING_N", "4"))
N4_CPUS = 4 * N_CPUS
RUNS = int(os.environ.get("SCALING_RUNS", "3"))
DEFAULT_ROWS = 30_000_000


def _materialize_rows(n_rows: int) -> str:
    from pyspark.sql import functions as F

    from image_pdf_ocr_suite_spark.session import build_session

    path = f"/tmp/rank_rows_{n_rows}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path  # deterministic synthesis — safe to reuse
    spark = build_session(app="rank-scaling-prep", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    (spark.range(n_rows)
     .select(F.col("id").alias("doc_id"),
             # heavy ties: 4k distinct token counts over n_rows rows
             # (pmod — a signed % would yield ~8191 distinct values)
             F.pmod(F.xxhash64("id"), F.lit(4096)).alias("n_tokens"))
     .repartition(64).write.mode("overwrite").parquet(path))
    spark.stop()
    return path


def _run_once(cpus: int, rows_path: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "BENCH", "rank_once.py"),
         str(cpus), rows_path],
        capture_output=True, text=True, cwd=REPO, timeout=3600)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_ROWS
    rows_path = _materialize_rows(n_rows)
    pairs = []
    for _ in range(RUNS):
        r_n = _run_once(N_CPUS, rows_path)
        r_4n = _run_once(N4_CPUS, rows_path)
        pairs.append({
            "n": r_n, "n4": r_4n,
            "rank_eff": round(r_4n["rank_rows_per_sec"]
                              / (4.0 * r_n["rank_rows_per_sec"]), 3),
            "sort_eff": round(r_4n["sort_rows_per_sec"]
                              / (4.0 * r_n["sort_rows_per_sec"]), 3)})
    rank_effs = sorted(p["rank_eff"] for p in pairs)
    sort_effs = sorted(p["sort_eff"] for p in pairs)
    rank_eff = rank_effs[len(rank_effs) // 2]
    sort_eff = sort_effs[len(sort_effs) // 2]
    best = max(pairs, key=lambda p: p["n"]["rank_rows_per_sec"])
    over_n = round(best["n"]["rank_sec"] / best["n"]["sort_sec"], 2)
    over_4n = round(best["n4"]["rank_sec"] / best["n4"]["sort_sec"], 2)
    result = {
        "metric": "global_rank_scaling_efficiency_N_to_4N",
        "value": rank_eff, "unit": "ratio",
        "rank_pair_efficiencies": rank_effs,
        "orderby_baseline_pair_efficiencies": sort_effs,
        "rank_over_orderby_wall_ratio": {"n": over_n, "n4": over_4n},
        "n": best["n"], "n4": best["n4"], "n_rows": n_rows,
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(result), flush=True)

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(f"""

## Global-rank vs orderBy-baseline scaling run {result['measured_at']}

relational/globalrank.curriculum_shards (range exchange +
sortWithinPartitions pinned by a DISK_ONLY localCheckpoint + bounded
count pass + pure-Catalyst rank projection) timed back-to-back with
Spark's own ``orderBy`` (the same range-exchange machinery, no rank)
over {n_rows} (doc_id, n_tokens) rows (4k-way key ties,
pre-synthesized parquet), fixed 64-way range-partition graph, {RUNS}
interleaved pairs, slots <= cores/2 at both levels.

| level | cores | orderBy sec | rank sec | rank/orderBy |
|---|---|---|---|---|
| N | {best['n']['cpus']} | {best['n']['sort_sec']} | {best['n']['rank_sec']} | {over_n} |
| 4N | {best['n4']['cpus']} | {best['n4']['sort_sec']} | {best['n4']['rank_sec']} | {over_4n} |

**Scaling efficiency** = throughput(4N) / (4 x throughput(N)):
rank **{rank_eff}** (pairs: {rank_effs}); orderBy baseline
**{sort_eff}** (pairs: {sort_effs}).
""")


if __name__ == "__main__":
    main()
