"""Streaming twin of the quality funnel (analytics/funnel.py): admit
documents into the training corpus AS THEY ARRIVE, with the same
first-reject attrition accounting as the batch report.

Per micro-batch, the exact batch operator runs against the static
held-out set (decontamination grams hashed once and persisted, the
stream side a map-only probe).  Two snapshot tables are committed with
the per-table replay guard (exactly-once across restarts):

- ``admitted``: the surviving (id) rows — the corpus feed;
- ``attrition``: the per-batch 5-row report.

Because every gate is per-document and micro-batches partition the
input, the per-stage SUM of per-batch reports equals the one-shot batch
report over the union (first-reject attribution is per-doc) — pinned by
tests/test_streaming_funnel.py, which also kills and restarts the
stream mid-input.  ``funnel_report_total`` re-aggregates the committed
report table into the cumulative funnel."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_pdf_ocr_suite_spark.analytics import funnel as funnel_mod
from image_pdf_ocr_suite_spark.streaming.stream import _batch_committed
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable


def funnel_report_total(report_df: DataFrame) -> DataFrame:
    """Cumulative attrition across committed per-batch reports: per-doc
    gates + partitioned batches => per-stage sums compose exactly."""
    return (report_df.groupBy("stage_ord", "stage")
            .agg(F.sum("n_in").cast("bigint").alias("n_in"),
                 F.sum("n_rejected").cast("bigint").alias("n_rejected"),
                 F.sum("n_out").cast("bigint").alias("n_out")))


def start_funnel_stream(spark: SparkSession, input_dir: str, schema,
                        output_root: str, checkpoint_dir: str,
                        test_docs: DataFrame | None = None,
                        url_col: str = "url", text_col: str = "text",
                        id_col: str = "doc_id",
                        langs: tuple[str, ...] = ("en",),
                        min_ratio_bp: int = 4300,
                        max_ratio_bp: int = 9000,
                        ngram_n: int = 5,
                        max_files_per_trigger: int = 8,
                        available_now: bool = True):
    """Continuous corpus admission: pages dir -> admitted-ids table +
    per-batch attrition table.  Returns the StreamingQuery."""
    from pyspark import StorageLevel

    from image_pdf_ocr_suite_spark.analytics.corpusprep import (
        test_gram_table)

    admitted_table = SnapshotTable(f"{output_root}/admitted")
    report_table = SnapshotTable(f"{output_root}/attrition")
    grams = None
    if test_docs is not None:
        # hash the static held-out set ONCE, not once per micro-batch
        grams = test_gram_table(test_docs, n=ngram_n, text_col=text_col,
                                id_col=id_col) \
            .persist(StorageLevel.MEMORY_AND_DISK)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        run_id = f"funnel-batch-{batch_id}"
        adm_done = _batch_committed(admitted_table, run_id)
        rep_done = _batch_committed(report_table, run_id)
        if adm_done and rep_done:
            return                      # fully committed replay
        verdicts = funnel_mod.funnel_verdicts(
            batch_df, url_col=url_col, text_col=text_col, id_col=id_col,
            langs=langs, min_ratio_bp=min_ratio_bp,
            max_ratio_bp=max_ratio_bp, ngram_n=ngram_n,
            test_grams=grams)
        if not adm_done:
            admitted_table.append(
                verdicts.where(F.col("rej_at").isNull()).select("id"),
                run_id=run_id)
        if not rep_done:
            report_table.append(
                funnel_mod.funnel_report(verdicts, spark),
                run_id=run_id)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(input_dir))
    writer = (stream.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
