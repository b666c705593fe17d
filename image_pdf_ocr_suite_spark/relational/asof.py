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
from pyspark.sql.types import NumericType

_SIDE, _TIME, _VALS = "__asof_side", "__asof_t", "__asof_vals"
_BKT = "__asof_bkt"


def _bucket_expr(time_col, dtype, width_sec: float):
    """Deterministic time bucket: floor-division of the timeline by
    ``width_sec`` — both sides compute it identically from the raw time,
    so bucket boundaries agree with no coordination."""
    if isinstance(dtype, NumericType):
        return F.floor(F.col(time_col) / F.lit(float(width_sec))).cast("long")
    return F.floor(F.unix_micros(F.col(time_col))
                   / F.lit(float(width_sec) * 1e6)).cast("long")


def asof_join_backward(left: DataFrame, right: DataFrame, keys: list[str],
                       left_time: str, right_time: str,
                       value_cols: list[str],
                       bucket_seconds: float | None = None) -> DataFrame:
    """Left rows + the most recent right ``value_cols`` at or before each
    left row's time (null when no prior right row exists).

    ``bucket_seconds`` is the hot-key defense: the default plan
    partitions on ``keys`` alone, so one key owning 20 % of the events
    serializes 20 % of the data through a single partition's sort.  With
    ``bucket_seconds`` set, rows partition on ``(keys, time-bucket)`` —
    a hot key's timeline splits across buckets that sort in parallel —
    and the carry across bucket boundaries runs as a second window over
    the per-(key, bucket) LAST right-side values only (one row per
    non-empty bucket, orders of magnitude smaller than the data).
    Output-identical to the unbucketed plan (equivalence pytest-pinned);
    costs one extra small shuffle + a co-partitioned join.  Measured at
    one key owning 20 % of 2 M events: see BASELINE.md §as-of skew."""
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
    out_left = [c for c in lcols if c not in keys]
    if bucket_seconds is None:
        w = Window.partitionBy(*keys).orderBy(_TIME, _SIDE) \
            .rowsBetween(Window.unboundedPreceding, 0)
        carried = F.last(_VALS, ignorenulls=True).over(w).alias(_VALS)
        matched = (u.select(*keys, _TIME, _SIDE, *out_left, carried)
                   .where(F.col(_SIDE) == 1))
    else:
        dtype = left.schema[left_time].dataType
        u = u.withColumn(_BKT, _bucket_expr(_TIME, dtype, bucket_seconds))
        # within-bucket carry: hot keys split across buckets, sorts run
        # in parallel per (key, bucket)
        wb = Window.partitionBy(*keys, _BKT).orderBy(_TIME, _SIDE) \
            .rowsBetween(Window.unboundedPreceding, 0)
        inbkt = u.select(*keys, _TIME, _SIDE, _BKT, *out_left,
                         F.last(_VALS, ignorenulls=True).over(wb).alias(_VALS))
        # boundary carry-in: latest right struct of every STRICTLY earlier
        # bucket — computed over one row per non-empty (key, bucket), a
        # sliver of the data, so its key-only window is never hot.  Every
        # bucket present in the union gets a row (left-only buckets carry
        # a null tail), so the join below never misses
        tail = (u.groupBy(*keys, _BKT)
                .agg(F.max_by(
                    _VALS, F.when(F.col(_SIDE) == 0, F.col(_TIME)))
                    .alias(_VALS)))
        wc = Window.partitionBy(*keys).orderBy(_BKT) \
            .rowsBetween(Window.unboundedPreceding, -1)
        carry = tail.select(
            *keys, _BKT,
            F.last(_VALS, ignorenulls=True).over(wc).alias("__asof_carry"))
        matched = (inbkt.where(F.col(_SIDE) == 1)
                   .join(carry, [*keys, _BKT], "left")
                   .select(*keys, _TIME, *out_left,
                           F.coalesce(F.col(_VALS), F.col("__asof_carry"))
                           .alias(_VALS)))
    return matched.select(
        *keys, F.col(_TIME).alias(left_time), *out_left,
        *[F.col(_VALS).getField(c).alias(c) for c in value_cols])
