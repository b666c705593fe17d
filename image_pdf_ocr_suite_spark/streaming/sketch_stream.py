"""Streaming sketch ingest: fold mergeable sketches over a document
stream, one bounded partial per micro-batch, exactly-once.

The batch sketches (analytics/sketches.py count-min, kmv; hll.py) are
mergeable by construction — count-min by bucket-wise SUM, HLL by
register MAX, KMV by re-min.  This module gives the two fold algebras
their streaming twins: each micro-batch builds its own bounded partial
with the EXACT batch operator (``cm_build`` / ``hll_registers``) and
appends it to a snapshot table under the stream.py replay guard
(exactly-once across restarts); the current sketch is the fold of the
appended partials.  Because integer SUM and MAX are commutative and
associative, the folded streaming sketch equals the batch operator
over the static union of all inputs ROW FOR ROW — pinned by
tests/test_sketch_stream.py, the same equivalence contract as the
decontamination and watermark-dedup twins.

Scale shape: per batch only ``depth × n_distinct_items`` (count-min) /
``≤ m`` per group (HLL) rows enter the sketch aggregation and a fixed
number of rows are appended (~4k / ≤1k at the defaults) — the item
stream itself never re-shuffles and never accumulates.  The table
grows one bounded partial per batch; the fold reads
``n_batches × partial_size`` rows, and a periodic
``SnapshotTable.compact`` (tableio/snapshot.py) can rewrite it to the
folded form without changing any estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics.sketches import cm_build
from image_pdf_ocr_suite_spark.streaming.stream import _batch_committed
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable


def fold_sketch(partials: DataFrame) -> DataFrame:
    """Merge appended count-min partials into the current sketch —
    bucket-wise integer SUM (commutative/associative → batch-order
    independent)."""
    return (partials.groupBy("row", "bucket")
            .agg(F.sum("cnt").cast("bigint").alias("cnt")))


def live_sketch(spark: SparkSession, output_root: str) -> DataFrame:
    """The current folded sketch of a running (or finished) stream.
    Before the first micro-batch commits — or after zero input files —
    the partial table has no snapshot yet (``SnapshotTable.read``
    returns None); that reads as an EMPTY sketch (every estimate 0,
    count-min's correct zero-mass answer), not an error."""
    partials = SnapshotTable(f"{output_root}/cm_partials").read(spark)
    if partials is None:
        partials = spark.createDataFrame(
            [], "row int, bucket bigint, cnt bigint")
    return fold_sketch(partials)


def start_cm_sketch_stream(spark: SparkSession, input_dir: str, schema,
                           output_root: str, checkpoint_dir: str,
                           item_col: str = "text", depth: int = 4,
                           width: int = 1024, available_now: bool = True):
    """Continuous count-min ingest: parquet file stream → per-batch
    partial sketch → snapshot-committed partial table (exactly-once).
    Returns the StreamingQuery; read the live sketch with
    ``live_sketch(spark, output_root)`` (empty-sketch-safe before the
    first commit)."""
    table = SnapshotTable(f"{output_root}/cm_partials")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        run_id = f"cm-batch-{batch_id}"
        if _batch_committed(table, run_id):
            return  # replayed micro-batch after restart
        partial = cm_build(batch_df.select(item_col), item_col,
                           depth=depth, width=width)
        table.append(partial, run_id=run_id)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "4").parquet(input_dir))
    writer = (stream.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def fold_hll(partials: DataFrame, group_cols=("lang",)) -> DataFrame:
    """Merge appended HLL register partials — per-(group, bucket) MAX
    (``hll.hll_merge``'s algebra: merge == registers-of-union exactly)."""
    return (partials.groupBy(*list(group_cols), "bucket")
            .agg(F.max("r").alias("r")))


def live_hll(spark: SparkSession, output_root: str,
             group_cols=("lang",)) -> DataFrame:
    """The current folded HLL register table of a running (or finished)
    stream; an uncommitted table reads as an empty register set (every
    group estimate 0 via the absent-bucket convention)."""
    partials = SnapshotTable(f"{output_root}/hll_partials").read(spark)
    if partials is None:
        fields = ", ".join(f"{g} string" for g in group_cols)
        partials = spark.createDataFrame(
            [], f"{fields}, bucket int, r int")
    return fold_hll(partials, group_cols)


def start_hll_sketch_stream(spark: SparkSession, input_dir: str, schema,
                            output_root: str, checkpoint_dir: str,
                            value_col: str = "text",
                            group_cols=("lang",), p: int = 10,
                            available_now: bool = True):
    """Continuous HLL distinct-count ingest: parquet file stream →
    per-batch register partial (the EXACT batch operator,
    ``hll.hll_registers``) → snapshot-committed partial table
    (exactly-once).  Returns the StreamingQuery; read the live sketch
    with ``live_hll(spark, output_root)`` and estimate with
    ``hll.hll_estimate``."""
    from image_pdf_ocr_suite_spark.analytics.hll import hll_registers

    table = SnapshotTable(f"{output_root}/hll_partials")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        run_id = f"hll-batch-{batch_id}"
        if _batch_committed(table, run_id):
            return  # replayed micro-batch after restart
        partial = hll_registers(batch_df, value_col, p=p,
                                group_cols=list(group_cols))
        table.append(partial, run_id=run_id)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "4").parquet(input_dir))
    writer = (stream.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
