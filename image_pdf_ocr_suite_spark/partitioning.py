"""Scale-adaptive fan-out for CPU-bound kernel stages.

The engine's Python kernels (mapInPandas / pandas_udf) and heavy
Catalyst explodes inherit the SCAN's task graph.  A production corpus
scan has thousands of file splits, but a small table written as one
parquet row group yields exactly ONE non-empty scan task — Spark packs
byte-range splits, and every split that does not contain a row-group
start reads nothing — so the whole kernel stage runs on one core no
matter how many executors exist (measured round 6: the 50k-doc bench
table is one 5.9 MB row group, and every docs-shaped kernel leg scaled
~linearly with input size, i.e. serially).

``fan_out_small`` is the guide-§2 "derive partitioning from the input,
not a constant" device: when the plan's current partitioning is
materially below the cluster's parallelism it round-robin repartitions
to ``factor × defaultParallelism``; otherwise it is a NO-OP, so a real
many-split corpus scan never pays an extra exchange.  The repartition
is deterministic (Spark sorts before round-robin redistribution —
SPARK-23207) and every caller is partitioning-independent (map-only
kernels, exact-integer aggregations, bounded partial sketches), so
results are bit-identical either way — pinned by the oracle-parity
suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_small(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition ``df`` to ``factor × defaultParallelism`` when its
    current plan has materially fewer partitions (< parallelism);
    otherwise return ``df`` unchanged.  Use immediately before a
    CPU-bound per-row stage (Python kernel, tokenize+explode chain)."""
    try:
        sc = df.sparkSession.sparkContext
        target = sc.defaultParallelism * factor
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= max(sc.defaultParallelism, 1):
        return df
    return df.repartition(target)
