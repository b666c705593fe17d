"""Distributed as-of (backward) join — an operator Spark lacks natively.

``ASOF JOIN`` (kdb/DuckDB/Pandas ``merge_asof``) matches each left row to
the single right row with the greatest ``right.time <= left.time`` per
key.  The naive Spark spelling is a range join (``l.key = r.key AND
r.ts <= l.ts`` + a row_number window over every candidate), which
explodes to O(|matches per key|²) intermediate rows — a scale killer on
hot keys.

The scalable composition used here is **union + ordered last-non-null
window**: tag the two inputs, union them, sort each key's timeline once,
and carry the most recent right-side values forward.  Cost = ONE shuffle
on the key and one sort per partition — the same plan shape as any
window aggregate, with no intermediate blow-up, AQE-skew-splittable like
any exchange.  Right rows at exactly the left timestamp sort BEFORE the
left row (side 0 < side 1), giving the standard inclusive (>=) as-of
semantics.

Right-side uniqueness per (key, time) is the caller's contract (ties at
identical timestamps have no defined "latest"); aggregate the right side
first — e.g. ``groupBy(key, ts).agg(...)`` — as the registered driver
query does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE, _TIME, _VALS = "__asof_side", "__asof_t", "__asof_vals"


def asof_join_backward(left: DataFrame, right: DataFrame, keys: list[str],
                       left_time: str, right_time: str,
                       value_cols: list[str]) -> DataFrame:
    """Left rows + the most recent right ``value_cols`` at or before each
    left row's time (null when no prior right row exists)."""
    lcols = [c for c in left.columns if c not in (left_time,)]
    # the right-side values travel inside ONE struct that is non-null
    # exactly for right rows: last(ignorenulls) then matches the latest
    # right ROW, even when the value inside it is NULL (matching ASOF /
    # merge_asof semantics — a matched NULL stays NULL, it is not skipped
    # in favor of an older non-null value)
    vals_t = right.select(F.struct(*value_cols).alias("v")) \
        .schema["v"].dataType
    l = left.select(
        *keys, F.col(left_time).alias(_TIME), F.lit(1).alias(_SIDE),
        *[F.col(c) for c in lcols if c not in keys],
        F.lit(None).cast(vals_t).alias(_VALS))
    r = right.select(
        *keys, F.col(right_time).alias(_TIME), F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in keys],
        F.struct(*value_cols).alias(_VALS))
    u = l.unionByName(r)
    w = Window.partitionBy(*keys).orderBy(_TIME, _SIDE) \
        .rowsBetween(Window.unboundedPreceding, 0)
    carried = F.last(_VALS, ignorenulls=True).over(w).alias(_VALS)
    out_left = [c for c in lcols if c not in keys]
    return (u.select(*keys, _TIME, _SIDE, *out_left, carried)
            .where(F.col(_SIDE) == 1)
            .select(*keys, F.col(_TIME).alias(left_time), *out_left,
                    *[F.col(_VALS).getField(c).alias(c)
                      for c in value_cols]))
