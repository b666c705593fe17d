"""Distributed stable global rank — total order without a
single-partition window.

``ROW_NUMBER() OVER (ORDER BY ...)`` with an empty PARTITION BY
collapses to ONE task in Spark (every row through a single window
partition) — the classic 100-TB anti-pattern.  The scalable spelling is
the two-pass range-sort:

1. ``repartitionByRange(order) . sortWithinPartitions(order)`` — ONE
   data-sized exchange; range partition ``i`` holds a contiguous slice
   of the total order (ascending partition ids = ascending ranges).
   ``monotonically_increasing_id()`` projected on top of the sort
   encodes the partition-local position in its low 33 bits — free, in
   whole-stage codegen, no Python stage.
2. Per-partition row counts (bounded: ``n_partitions`` rows to the
   driver), prefix-summed into offsets.
3. ``rank = offsets[pid] + (mid & (2^33 - 1))`` — a dense array-literal
   lookup (O(1) per row) plus integer ops, pure Catalyst.

Boundary-consistency invariant: the offsets from pass 2 must describe
the SAME partitioning pass 3 reads.  ``RangePartitioner`` samples its
boundaries with an RDD-id-derived seed, so two independent executions
of the exchange may legally pick DIFFERENT boundaries — the sorted
frame is therefore pinned once with ``localCheckpoint`` and both
passes read the materialized partitions (on a real cluster substitute
a reliable checkpoint / persist(DISK_ONLY); the cost is one
materialization of the shuffled data, exactly what RDD
``zipWithIndex`` pays).  The rank itself never depends on where the
boundaries fell — it is a pure function of the total order — which is
why callers MUST pass a total order (``order_cols`` ending in a unique
key, e.g. ``doc_id``): with a non-total order, rows equal under the
key sort arbitrarily within their partition.

This is the curriculum-ordering primitive of a training-data pipeline:
rank the corpus by a quality/difficulty score and cut the total order
into fixed-size shards (``curriculum_shards``) so shard k is globally
easier/better than shard k+1 — at 10^12 documents the only data-sized
movement is the one range exchange.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PID = "__gr_pid"


def _as_cols(order_cols: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


_MID = "__gr_mid"
_LOCAL_MASK = (1 << 33) - 1  # monotonically_increasing_id low bits


def global_rank(df: DataFrame, order_cols: Sequence[str | Column],
                n_partitions: int | None = None,
                rank_col: str = "rk",
                checkpoint_storage=None) -> DataFrame:
    """``df`` plus a 0-based BIGINT ``rank_col`` giving each row's exact
    position under the total order ``order_cols`` (which must include a
    unique tiebreaker column — see module docstring).

    ``checkpoint_storage``: StorageLevel for the one pinned
    materialization (default = Spark's localCheckpoint default,
    MEMORY_AND_DISK deserialized).  Pass
    ``StorageLevel.DISK_ONLY`` when the ranked frame is large relative
    to executor memory — serialized spill beats GC-pressured caching."""
    cols = _as_cols(order_cols)
    ranged = (df.repartitionByRange(*cols) if n_partitions is None
              else df.repartitionByRange(n_partitions, *cols))
    # mid's low 33 bits = row number within the sorted partition;
    # localCheckpoint pins ONE materialization so the count pass and
    # the rank pass see identical range boundaries (module docstring)
    srt = (ranged.sortWithinPartitions(*cols)
           .select("*", F.spark_partition_id().alias(_PID),
                   F.monotonically_increasing_id().alias(_MID))
           .localCheckpoint(eager=False, storageLevel=checkpoint_storage))

    # pass 1: bounded per-partition counts -> prefix-sum offsets
    counts = {int(r[_PID]): int(r["c"])
              for r in srt.groupBy(_PID).agg(
                  F.count(F.lit(1)).alias("c")).collect()}
    if not counts:
        return df.withColumn(rank_col, F.lit(None).cast("bigint"))

    # pass 2: pure Catalyst — dense array-literal offset lookup (O(1)
    # per row; a create_map literal scans its key list per row, which
    # is O(n_partitions) per row at 10^12 scale) + integer ops.  Empty
    # partitions get the running offset — no row ever reads them.
    n_parts = max(counts) + 1
    arr, acc = [], 0
    for pid in range(n_parts):
        arr.append(acc)
        acc += counts.get(pid, 0)
    rank = (F.element_at(F.lit(arr), F.col(_PID) + 1).cast("bigint")
            + F.col(_MID).bitwiseAND(F.lit(_LOCAL_MASK)))
    return (srt.withColumn(rank_col, rank.cast("bigint"))
            .drop(_PID, _MID))


def curriculum_shards(df: DataFrame, order_cols: Sequence[str | Column],
                      shard_size: int, n_partitions: int | None = None,
                      rank_col: str = "rk", shard_col: str = "shard",
                      checkpoint_storage=None) -> DataFrame:
    """Cut the total order into fixed-size shards:
    ``shard = rank // shard_size`` — shard k strictly precedes shard
    k+1 in the curriculum order."""
    if shard_size <= 0:
        raise ValueError(f"shard_size must be positive (got {shard_size})")
    ranked = global_rank(df, order_cols, n_partitions, rank_col,
                         checkpoint_storage=checkpoint_storage)
    return ranked.withColumn(
        shard_col, F.expr(f"`{rank_col}` div {int(shard_size)}"))
