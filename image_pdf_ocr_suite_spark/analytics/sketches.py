"""Mergeable cardinality / frequency sketches for corpus statistics.

Two deterministic, cross-engine-checkable sketches a 100-TB corpus
pipeline needs where exact answers are shuffle-prohibitive:

- **KMV (k-minimum-values) distinct sketch** — distinct-count estimation
  (Bar-Yossef et al. 2002; the theta-sketch bottom-k form).  The sketch
  of a column is the ``k`` smallest *distinct* 48-bit hash values;
  sketches merge by union-then-trim, so partitions combine associatively
  and the estimate is ``(k-1) * 2^48 // kth_min`` — all integer
  arithmetic, bit-identical in any engine.
- **Count-min sketch** (Cormode & Muthukrishnan 2005) — frequency
  estimation with one-sided error.  ``depth`` independent md5-derived
  bucket rows of ``width`` counters; a point estimate is the min across
  rows.  Counter updates are plain ``GROUP BY`` sums, so the build is a
  map-side-combinable aggregation and the finished sketch is
  ``depth*width`` rows regardless of corpus size.
- **Log-bucket histogram quantile sketch** (the HdrHistogram layout) —
  rank statistics over non-negative integers with a ``2^-precision``
  relative value error.  A value keeps its top ``precision+1``
  significant bits; the sketch is an ordinary ``GROUP BY bucket`` count
  (map-side combinable, ≤ ``63 * 2^precision`` buckets total no matter
  the corpus size) and two sketches merge by summing counts bucket-wise.
  Quantiles read off the cumulative histogram with pure integer
  thresholds, so Spark and the SQL oracle agree bit-for-bit.

Hashing contract (shared with the SQL oracles — change BOTH or neither):
48-bit value = first 12 hex chars of md5, i.e. Spark
``conv(substr(md5(x), 1, 12), 16, 10)`` ==
DuckDB ``CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)``; count-min row
``j`` hashes ``md5(j || ':' || token)``.

Reference scope note: the reference suite (Hiro-Chiba/image-pdf-ocr-suite)
has no sketch layer — these are the task-mandated training-data-pipeline
additions (SURVEY §2 LLM-pipeline family), built Spark-first.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame, functions as F

HASH_BITS = 48
HASH_SPACE = 1 << HASH_BITS


def hash48_expr(col):
    """48-bit md5 hash of a (string-cast) column — small enough that all
    sketch arithmetic stays exact in BIGINT on both engines."""
    return (F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 12),
                   16, 10).cast("bigint"))


# ---------------------------------------------------------------------------
# KMV distinct sketch
# ---------------------------------------------------------------------------

def kmv_minima(df: DataFrame, col: str, k: int = 256,
               group_cols: Sequence[str] = ()) -> DataFrame:
    """Per-group KMV sketch: ``(group..., minima array<bigint>)`` with the
    ``<= k`` smallest distinct 48-bit hashes of ``col``, ascending.

    Scale shape: a partition-level Arrow kernel emits at most ``k``
    ``(group, hash)`` rows per group per batch (the partial sketch), so
    the merge ``groupBy`` shuffles ``O(batches * k)`` rows per group —
    never the distinct-value set itself.  The final union-trim is a
    Catalyst ``collect_set -> array_sort -> slice`` over that bounded
    input.  No text rides any shuffle — hashes only."""
    import pandas as pd  # noqa: F401  (kernel-side)

    gcols = list(group_cols)
    hashed = df.select(*gcols, hash48_expr(col).alias("__h")).where(
        F.col("__h").isNotNull())

    out_schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in gcols]
        + ["__h bigint"])

    def partial(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            dedup = pdf.drop_duplicates()
            dedup = dedup.sort_values([*gcols, "__h"], kind="mergesort")
            if gcols:
                yield dedup.groupby(gcols, sort=False).head(k)
            else:
                yield dedup.head(k)

    partials = hashed.mapInPandas(partial, schema=out_schema)
    agg = partials.groupBy(*gcols) if gcols else partials.groupBy()
    return agg.agg(
        F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("minima"))


def kmv_distinct(df: DataFrame, col: str, k: int = 256,
                 group_cols: Sequence[str] = ()) -> DataFrame:
    """Per-group distinct-count estimate from the KMV sketch:
    ``(group..., n_minima int, est_distinct bigint)``.

    With fewer than ``k`` distinct hashes the sketch IS the distinct set
    (exact count); at ``k`` the estimator is ``(k-1) * 2^48 // kth_min``
    — integer division, so Spark and the SQL oracle agree bit-for-bit."""
    sk = kmv_minima(df, col, k=k, group_cols=group_cols)
    n = F.size("minima")
    kth = F.element_at("minima", n)
    est = F.when(n < k, n.cast("bigint")).otherwise(
        F.expr(f"CAST({(k - 1) * HASH_SPACE} AS BIGINT) div "
               f"element_at(minima, size(minima))"))
    return sk.select(*group_cols, n.cast("int").alias("n_minima"),
                     est.alias("est_distinct"))


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

def cm_bucket_expr(item_col: str, row: int, width: int):
    """Bucket of ``item_col`` in count-min row ``row``:
    48-bit md5 of ``row:item``, mod ``width``."""
    tagged = F.concat(F.lit(f"{row}:"), F.col(item_col).cast("string"))
    return (F.conv(F.substring(F.md5(tagged), 1, 12), 16, 10)
             .cast("bigint") % width)


def cm_build(items: DataFrame, item_col: str, count_col: str | None = None,
             depth: int = 4, width: int = 1024) -> DataFrame:
    """Build a count-min sketch table ``(row int, bucket bigint,
    cnt bigint)`` from an item stream (or pre-counted ``(item, count)``
    pairs via ``count_col``).

    Scale shape: raw items are first reduced to ``(item, count)`` —
    an ordinary map-side-combinable word count — and only the DISTINCT
    items fan out ``depth`` bucket rows, so the sketch aggregation input
    is ``depth * n_distinct`` rows and the finished sketch is
    ``depth * width`` rows total: broadcastable, mergeable (sketches of
    two corpora merge by summing counters bucket-wise)."""
    if count_col is None:
        counted = (items.groupBy(item_col)
                   .agg(F.count(F.lit(1)).cast("bigint").alias("__c")))
        count_col = "__c"
    else:
        counted = items
    rows = counted.select(
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("row"),
                     cm_bucket_expr(item_col, j, width).alias("bucket"))
            for j in range(depth)])).alias("rb"),
        F.col(count_col).alias("__c"))
    return (rows.groupBy(F.col("rb.row").alias("row"),
                         F.col("rb.bucket").alias("bucket"))
                .agg(F.sum("__c").cast("bigint").alias("cnt")))


def cm_estimate(sketch: DataFrame, probes: DataFrame, item_col: str,
                depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-estimate counts for ``probes[item_col]`` against a built
    sketch: ``(item, est_count bigint)`` with
    ``est = min_j sketch[j][h_j(item)]`` (0 when a bucket is empty —
    count-min's one-sided guarantee: ``est >= true``).

    Scale shape: the probe side fans out ``depth`` rows per probe and
    joins the ``depth*width``-row sketch — AQE broadcasts the sketch, so
    probing never shuffles the corpus."""
    probe_rows = probes.select(
        F.col(item_col),
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("row"),
                     cm_bucket_expr(item_col, j, width).alias("bucket"))
            for j in range(depth)])).alias("rb"))
    joined = probe_rows.join(
        sketch,
        (F.col("rb.row") == sketch["row"])
        & (F.col("rb.bucket") == sketch["bucket"]),
        "left")
    return (joined.groupBy(item_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                  .cast("bigint").alias("est_count")))


# ---------------------------------------------------------------------------
# Log-bucket histogram quantile sketch (HdrHistogram layout)
# ---------------------------------------------------------------------------

def log_bucket_sql(col_sql: str, precision: int = 4) -> str:
    """SQL expression for the log-bucket lower bound of a non-negative
    integer: the value with all but its top ``precision+1`` significant
    bits cleared.  ``e = length(bin(v))`` (significant-bit count),
    ``shift = max(e - 1 - precision, 0)``, ``lo = (v >> shift) << shift``.
    Every op is integer and both engines have ``bin``/``>>``/``<<``, so
    the Spark spelling and the DuckDB oracle spelling are the same text
    modulo shift syntax (``shiftright(v, s)`` vs ``v >> s``)."""
    v = f"greatest(cast(({col_sql}) as bigint), 0)"
    sh = f"greatest(length(bin({v})) - 1 - {precision}, 0)"
    return f"shiftleft(shiftright({v}, {sh}), {sh})"


def histogram_sketch(df: DataFrame, col: str, precision: int = 4,
                     group_cols: Sequence[str] = ()) -> DataFrame:
    """Per-group log-bucket histogram ``(group..., bucket_lo bigint,
    cnt bigint)``.

    Scale shape: one map-side-combinable ``GROUP BY`` — the shuffle
    carries at most ``63 * 2^precision`` rows per group regardless of
    corpus size, and sketches of two corpora merge by summing ``cnt``
    per bucket.  This is the 100-TB path for length/latency/size
    distributions where ``percentile_approx`` -style single-pass rank
    stats are needed with a hard, provable value-error bound."""
    gcols = list(group_cols)
    b = F.expr(log_bucket_sql(col, precision)).alias("bucket_lo")
    return (df.select(*gcols, b)
              .groupBy(*gcols, "bucket_lo")
              .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))


def histogram_quantiles(sketch: DataFrame, qs: Sequence[int] = (50, 90, 99),
                        group_cols: Sequence[str] = ()) -> DataFrame:
    """Quantiles from a ``histogram_sketch``: ``(group..., q int,
    value bigint)`` where ``value`` is the ``bucket_lo`` of the smallest
    bucket whose cumulative count reaches ``ceil(q * total / 100)`` —
    a lower bound of the true q-th percentile within ``2^-precision``
    relative error.  All-integer thresholding (no float rank math), so
    the SQL oracle matches exactly.

    Scale shape: the window runs over the bounded sketch (≤ ``63 *
    2^precision`` rows per group), never over the data."""
    from pyspark.sql import Window

    gcols = list(group_cols)
    wcum = (Window.partitionBy(*gcols).orderBy("bucket_lo")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wtot = Window.partitionBy(*gcols)
    cum = (sketch
           .withColumn("__cum", F.sum("cnt").over(wcum))
           .withColumn("__total", F.sum("cnt").over(wtot))
           .select(*gcols, "bucket_lo", "__cum", "__total",
                   F.explode(F.array(*[F.lit(int(q)) for q in qs]))
                    .alias("q")))
    reached = cum.where(
        F.col("__cum") >= F.expr("CAST((__total * q + 99) AS BIGINT) div 100"))
    return (reached.groupBy(*gcols, "q")
                   .agg(F.min("bucket_lo").alias("value"))
                   .select(*gcols, F.col("q").cast("int").alias("q"),
                           F.col("value").cast("bigint").alias("value")))


# ---------------------------------------------------------------------------
# Bloom filter — mergeable membership sketch
# ---------------------------------------------------------------------------

def _bloom_halves(hex_col):
    """Two independent positive 60-bit BIGINTs from an md5-hex column
    (chars 1-15 and 16-30) — the double-hashing bases.  60 bits keeps
    ``h1 + i*h2`` inside signed-64 range for i <= 6."""
    h1 = F.conv(F.substring(hex_col, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(hex_col, 16, 15), 16, 10).cast("long")
    return h1, h2


def bloom_build(df: DataFrame, col: str, m_bits: int = 1 << 18,
                k: int = 4, hashed: bool = False) -> DataFrame:
    """Build a Bloom filter over a string column as a MERGEABLE
    ``(word_idx, bits)`` table: bit ``pos % 32`` of word ``pos // 32`` is
    set for each of the ``k`` double-hashed positions
    ``pos_i = (h1 + i*h2) mod m_bits`` (Kirsch & Mitzenmacher 2006) of
    each item's md5.  32-bit words stored in BIGINTs keep every literal
    and OR positive, so Spark and the SQL oracle agree bit-for-bit.

    The build is one map-only position fan-out + a ``BIT_OR`` GROUP BY —
    map-side combinable, and the finished sketch is at most
    ``m_bits / 32`` rows NO MATTER the input size: that bound (8192 rows
    at the 2^18 default) is the whole point — a held-out-set membership
    structure that broadcasts for pennies at 100 TB where the raw
    distinct-hash table might not.  Two builds over different slices
    merge by ``GROUP BY word_idx -> BIT_OR(bits)``.

    ``hashed=True`` means ``col`` already holds md5 hex (e.g. the
    ``__h`` output of corpusprep.test_gram_table); otherwise the column
    is md5-hashed here.  ``k`` is capped at 6 by the 60-bit half bound.
    """
    if not 0 < k <= 6:
        raise ValueError("bloom k must be in 1..6 (60-bit halves)")
    if m_bits < 32 or m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two >= 32")
    hx = F.col(col) if hashed else F.md5(F.col(col))
    h1, h2 = _bloom_halves(hx)
    pos = F.explode(F.array(*[(h1 + F.lit(i) * h2) % F.lit(m_bits)
                              for i in range(k)])).alias("__pos")
    return (df.select(pos)
            .select((F.col("__pos") / 32).cast("int").alias("word_idx"),
                    F.call_function(
                        "shiftleft", F.lit(1).cast("long"),
                        (F.col("__pos") % 32).cast("int")).alias("__mask"))
            .groupBy("word_idx")
            .agg(F.bit_or("__mask").alias("bits")))


def hex_halves_np(uhex):
    """Vectorized ``(h1, h2)`` int64 arrays from an array of md5-hex
    strings (chars 1-15 / 16-30) — nibble-decode + horner, no per-item
    Python ``int(x, 16)`` (measured ~1 s/M uniques saved in the fused
    decontamination kernel)."""
    import numpy as np

    if len(uhex) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    raw = np.array(uhex, dtype="S30").view(np.uint8).reshape(len(uhex), -1)
    nib = np.where(raw >= ord("a"), raw - (ord("a") - 10),
                   raw - ord("0")).astype(np.int64)
    h1 = np.zeros(len(uhex), dtype=np.int64)
    h2 = np.zeros(len(uhex), dtype=np.int64)
    for j in range(15):
        h1 = (h1 << 4) | nib[:, j]
        h2 = (h2 << 4) | nib[:, 15 + j]
    return h1, h2


def bloom_bits_array(bloom: DataFrame, m_bits: int):
    """Collect the word table into a dense uint32 array of ``m_bits/32``
    entries — a BOUNDED driver collect (8 KiB per 2^18 bits, independent
    of how much data built the filter; the same license as the IVF
    training sample).  This array IS the classical Bloom filter — the
    thing small enough to ship everywhere."""
    import numpy as np

    arr = np.zeros(m_bits // 32, dtype=np.uint32)
    for r in bloom.collect():
        arr[r["word_idx"]] = r["bits"]
    return arr


def bloom_maybe_contains(df: DataFrame, bloom, col: str,
                         m_bits: int = 1 << 18, k: int = 4,
                         hashed: bool = False, out_col: str = "maybe",
                         impl: str = "arrow") -> DataFrame:
    """Append boolean ``out_col``: true iff ALL ``k`` positions of the
    item's md5 are set in ``bloom`` (one-sided: never false for a truly
    inserted item; false-positive rate ~(1-e^{-kn/m})^k).

    ``impl="arrow"`` (default): the bounded bit array (``bloom`` may be
    the word-table DataFrame or a ready ``bloom_bits_array`` result)
    ships inside the probe kernel's closure — a single MAP-ONLY Python
    stage, zero joins, the item stream never shuffles; repeated hashes
    in a batch are factorized so each distinct md5 is position-tested
    once (the Zipf trick from the gram kernels).  ``impl="catalyst"``
    keeps the SQL-mirroring spelling — ``k`` chained broadcast left
    joins of the word table — as the oracle/equivalence reference
    (measured 2.6x the exact probe's wall at sf0.1; the kernel form
    reclaims it)."""
    if not 0 < k <= 6:
        raise ValueError("bloom k must be in 1..6 (60-bit halves)")
    if impl == "arrow":
        return _bloom_probe_arrow(df, bloom, col, m_bits, k, hashed,
                                  out_col)
    hx = F.col(col) if hashed else F.md5(F.col(col))
    h1, h2 = _bloom_halves(hx)
    out = df
    checks = []
    for i in range(k):
        pos = (h1 + F.lit(i) * h2) % F.lit(m_bits)
        w, b = f"__w{i}", f"__b{i}"
        side = F.broadcast(bloom.select(F.col("word_idx").alias(w),
                                        F.col("bits").alias(b)))
        out = out.join(side, (pos / 32).cast("int") == F.col(w), "left")
        mask = F.call_function("shiftleft", F.lit(1).cast("long"),
                               (pos % 32).cast("int"))
        checks.append(F.coalesce(F.col(b).bitwiseAND(mask) != 0,
                                 F.lit(False)))
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    drop = [c for i in range(k) for c in (f"__w{i}", f"__b{i}")]
    return out.withColumn(out_col, cond).drop(*drop)


def _bloom_probe_arrow(df: DataFrame, bloom, col: str, m_bits: int,
                       k: int, hashed: bool, out_col: str) -> DataFrame:
    """Map-only vectorized probe: factorize the batch's hex values, test
    each DISTINCT md5's k positions against the in-closure bit array,
    gather back."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bits = (bloom if isinstance(bloom, np.ndarray)
            else bloom_bits_array(bloom, m_bits))

    def _fn(s):
        codes, uniq = pd.factorize(s, use_na_sentinel=True)
        if len(uniq) == 0:
            return pd.Series([None] * len(s), dtype="boolean")
        hexes = (uniq if hashed else
                 [hashlib.md5(str(x).encode()).hexdigest() for x in uniq])
        h1, h2 = hex_halves_np(np.asarray(hexes, dtype=object))
        ok = np.ones(len(uniq), dtype=bool)
        for i in range(k):
            pos = (h1 + i * h2) % m_bits
            ok &= (bits[pos // 32] >> (pos % 32).astype(np.uint32)) & 1 == 1
        # null items probe False — the same verdict the join spelling's
        # coalesce(..., False) produces
        out = np.where(codes >= 0, ok[np.maximum(codes, 0)], False)
        return pd.Series(out, dtype="boolean")

    return df.withColumn(out_col, pandas_udf(_fn, "boolean")(F.col(col)))
