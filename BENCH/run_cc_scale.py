"""Star connected-components scale evidence (r4 VERDICT item 5).

Builds a DETERMINISTIC label-shuffled random-attachment graph entirely in
Spark (no driver-side data): n_nodes tree edges (every node i attaches to
xxhash(i) % i — random recursive tree, O(log n) diameter, power-law-ish
in-degree with hub nodes collecting many children) plus n_nodes extra
random edges, all through a feistel-style label shuffle so component
labels carry NO topological information — the case where min-label
pointer jumping stalls (measured: changed=1 for 30+ rounds on a shuffled
1024-chain) and the large-star/small-star rounds are the scale path.

Records rounds, wall, and the per-round edge-count collapse — the
property that survives 100 TB graphs: star rounds shuffle a monotonically
shrinking edge set (toward one star per component), while min-label
propagation reshuffles the full label frontier every round.

Pass criteria mirrored by tests/test_dedup_components.py at small scale:
rounds <= 8, edge counts non-increasing after the first two rounds.

Usage: python BENCH/run_cc_scale.py [n_nodes] [cpus]
Defaults: 5_000_000 nodes (~10M edges), 32 cpus.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from image_pdf_ocr_suite_spark.analytics import dedup  # noqa: E402
from image_pdf_ocr_suite_spark.session import build_session  # noqa: E402


def shuffled_powerlaw_edges(spark, n_nodes: int):
    """(id_a, id_b) edge list: random recursive tree + one extra random
    edge per node, labels shuffled by a hash permutation over a CLOSED id
    domain (pmod of xxhash over 2*n ids keeps the shuffle collision-free
    enough for evidence purposes; exactness of the permutation is not
    required — only that labels decorrelate from topology)."""
    base = spark.range(1, n_nodes).select(
        F.col("id").alias("i"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.col("id")).alias("p"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)),
               F.greatest(F.col("id"), F.lit(1))).alias("q"))
    tree = base.select("i", F.col("p").alias("j"))
    extra = base.select("i", F.col("q").alias("j"))
    edges = tree.union(extra).where(F.col("i") != F.col("j"))

    def shuf(c):
        # topology-decorrelating label map: bijective-enough hash into a
        # disjoint large id space (collisions only merge components,
        # which makes the instance HARDER, never easier)
        return F.xxhash64(F.col(c), F.lit(7))
    return edges.select(shuf("i").alias("id_a"), shuf("j").alias("id_b"))


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = build_session(app="cc-scale", master=f"local[{cpus}]",
                          shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")

    edges = shuffled_powerlaw_edges(spark, n_nodes)
    # materialize the input (the graph is the INPUT, not part of the
    # measured algorithm)
    edges = edges.localCheckpoint()
    n_edges = edges.count()

    load1 = round(os.getloadavg()[0], 2)
    t0 = time.perf_counter()
    comps = dedup.connected_components_star(edges, max_iters=15)
    n_comps = comps.select("comp").distinct().count()
    wall = round(time.perf_counter() - t0, 2)

    print(json.dumps({
        "metric": "cc_star_scale",
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "rounds": dedup._last_rounds,
        "edge_counts": dedup._last_edge_counts,
        "n_components": n_comps,
        "wall_sec": wall,
        "cpus": cpus,
        "load1_before": load1,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
