"""Streaming sketch ingest: fold a count-min sketch over a document
stream, one mergeable partial per micro-batch, exactly-once.

The batch sketches (analytics/sketches.py count-min, kmv; hll.py) are
mergeable by construction — count-min by bucket-wise SUM, HLL by
register MAX, KMV by re-min.  This module is the streaming twin for the
count-min member: each micro-batch builds its own ``depth×width``
partial with the EXACT batch operator (``cm_build``) and appends it to
a snapshot table under the stream.py replay guard (exactly-once across
restarts); the current sketch is the bucket-wise fold of the appended
partials.  Because counter addition is commutative and associative over
exact integers, the folded streaming sketch equals ``cm_build`` over
the static union of all inputs ROW FOR ROW — pinned by
tests/test_sketch_stream.py, the same equivalence contract as the
decontamination and watermark-dedup twins.

Scale shape: per batch only ``depth × n_distinct_items`` rows enter the
sketch aggregation and at most ``depth × width`` rows are appended
(fixed, ~4k rows at the defaults) — the item stream itself never
re-shuffles and never accumulates.  The table grows one bounded partial
per batch; ``fold_sketch`` reads ``n_batches × depth × width`` rows,
and a periodic ``SnapshotTable.compact`` (tableio/snapshot.py) can
rewrite it to the folded form without changing any estimate.
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
