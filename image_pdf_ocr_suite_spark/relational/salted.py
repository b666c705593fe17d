"""Salted aggregation for skewed keys (north_star skew defuse toolbox).

Page-level explode handles the giant-document skew inside the extraction
pipeline; this helper handles the OTHER skew shape — aggregations over a
hot key (one domain contributing 10% of a crawl).  Classic two-phase
pattern: partial-aggregate on (key, salt), then merge per key, so the hot
key's rows spread over ``n_salts`` reducers instead of one.

Works for any algebraic aggregate expressible as (partial, merge) pairs;
count/sum/min/max are provided.  (Spark's map-side partial aggregation
already covers most cases — explicit salting matters when upstream
partitioning feeds a single reducer, e.g. after a skewed join.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_agg(df: DataFrame, key_cols: list[str], n_salts: int = 16,
               counts: list[str] | None = None,
               sums: list[str] | None = None,
               maxs: list[str] | None = None) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) -> groupBy(key).

    Salt = deterministic spread of rows (hash of all columns' repr via
    monotonically varying partition offset would be non-deterministic;
    xxhash64 over value columns keeps runs reproducible)."""
    counts = counts or []
    sums = sums or []
    maxs = maxs or []
    value_cols = list(dict.fromkeys(counts + sums + maxs))
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in (key_cols + value_cols)]),
                  F.lit(n_salts)).alias("__salt")

    partial_aggs = (
        [F.count(F.lit(1)).alias("__cnt")] +
        [F.sum(c).alias(f"__sum_{c}") for c in sums] +
        [F.max(c).alias(f"__max_{c}") for c in maxs]
    )
    partial = df.select(*key_cols, salt, *[F.col(c) for c in value_cols]) \
        .groupBy(*key_cols, "__salt").agg(*partial_aggs)

    merge_aggs = []
    if counts:
        merge_aggs += [F.sum("__cnt").cast("bigint").alias(f"n_{c}") for c in counts[:1]]
    merge_aggs += [F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sums]
    merge_aggs += [F.max(f"__max_{c}").alias(f"max_{c}") for c in maxs]
    return partial.groupBy(*key_cols).agg(*merge_aggs)
