"""Streaming inverted-index ingest: continuous corpus indexing with an
always-queryable live BM25 index, exactly-once.

The posting relation (analytics/lexindex.py) is mergeable by UNION when
batches carry disjoint documents (the stream contract, same as
``append_to_inverted_index``): a document's ``(term, tf, dl)`` rows are
computed entirely within its own micro-batch, so the union of per-batch
posting partials IS the index.  The corpus constants fold by exact
integer SUM.  Each micro-batch therefore appends

- its postings (``lexindex.postings_frame`` — the batch spelling) to
  ``lex_postings``, and
- one ``(n_docs, sum_dl)`` row to ``lex_constants``,

both under the stream.py replay guard, two-table convention (a crash
between the two appends replays only the uncommitted table — the
run_id check is per table).  ``live_bm25`` scores queries against the
folded state at any moment through ``lexindex.bm25_over_postings`` —
the SAME scoring spelling as the parquet-layout probe — so
stream-ingested scores are BIT-identical to the batch operator over
the static union (pinned by tests/test_lex_stream.py, the sketch-twin
equivalence contract).

``compact_to_serving`` rewrites the streamed tables into the
partitioned serving layout + sidecar, after which
``lexindex.bm25_from_index`` answers with PartitionFilters pruning —
the stream→compact→serve lifecycle of a production index.

Scale shape: per batch one bounded explode+group over the BATCH only;
the accumulated posting table is append-only and never re-shuffles on
ingest.  ``live_bm25`` reads the snapshot with a pushed
(bucket, term) filter; the compacted layout adds partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import lexindex
from image_pdf_ocr_suite_spark.streaming.stream import _batch_committed
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable

_EMPTY_POSTS = ("term string, doc_id bigint, dl int, tf bigint, "
                "bucket int")


def start_lex_index_stream(spark: SparkSession, input_dir: str, schema,
                           output_root: str, checkpoint_dir: str,
                           id_col: str = "doc_id",
                           text_col: str = "text", n_buckets: int = 16,
                           available_now: bool = True):
    """Continuous index ingest: parquet document stream → per-batch
    posting partial + constants row, snapshot-committed (exactly-once).
    Returns the StreamingQuery; query the live index with
    ``live_bm25`` (empty-index-safe before the first commit)."""
    posts_table = SnapshotTable(f"{output_root}/lex_postings")
    const_table = SnapshotTable(f"{output_root}/lex_constants")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        run_id = f"lex-batch-{batch_id}"
        if not _batch_committed(posts_table, run_id):
            posts_table.append(
                lexindex.postings_frame(batch_df, id_col, text_col,
                                        n_buckets),
                run_id=run_id)
        if not _batch_committed(const_table, run_id):
            n, s = lexindex.corpus_constants(batch_df, text_col)
            # n_buckets rides in every constants row so readers use the
            # bucketing the postings were WRITTEN with (a mismatched
            # probe-side guess would silently drop hits — review fix)
            const_table.append(
                batch_df.sparkSession.createDataFrame(
                    [(n, s, n_buckets)],
                    "n_docs bigint, sum_dl bigint, n_buckets int"),
                run_id=run_id)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "4").parquet(input_dir))
    writer = (stream.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def live_constants(spark: SparkSession,
                   output_root: str) -> tuple[int, int, int]:
    """Folded exact corpus constants of a running (or finished) stream
    — integer SUM, batch-order independent — plus the n_buckets the
    postings were written with; (0, 0, 0) before the first commit.

    Crash window, documented: between a batch's postings append and
    its constants append (closed at replay), per-term df includes the
    batch while N/Σdl do not — ``live_bm25`` in that window scores
    against mixed prefixes.  Every COMMITTED state (both appends or
    neither) is bit-identical to the batch operator."""
    consts = SnapshotTable(f"{output_root}/lex_constants").read(spark)
    if consts is None:
        return 0, 0, 0
    row = consts.agg(F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n"),
                     F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("s"),
                     F.min("n_buckets").alias("b0"),
                     F.max("n_buckets").alias("b1")).collect()[0]
    if row["b0"] != row["b1"]:
        raise ValueError(f"inconsistent n_buckets in streamed index: "
                         f"{row['b0']} != {row['b1']}")
    return int(row["n"]), int(row["s"]), int(row["b0"])


def live_bm25(spark: SparkSession, output_root: str,
              query_terms: list[str],
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 against the live streamed index — bit-identical to the
    batch operator over the static union of everything ingested so
    far.  An uncommitted index reads as empty (zero hit rows), never
    an error.  The bucketing comes from the streamed constants (never
    a caller guess)."""
    n_docs, sum_dl, n_buckets = live_constants(spark, output_root)
    posts = SnapshotTable(f"{output_root}/lex_postings").read(spark)
    if posts is None or n_docs == 0:
        posts = spark.createDataFrame([], _EMPTY_POSTS)
        n_docs, sum_dl, n_buckets = 1, 1, 1  # unused: no postings
    terms = lexindex._dedupe_terms(query_terms)
    buckets = sorted({lexindex.term_bucket(t, n_buckets) for t in terms})
    posts = posts.where(F.col("bucket").isin(buckets))
    return lexindex.bm25_over_postings(posts, n_docs, sum_dl, terms,
                                       k1=k1, b=b)


def compact_to_serving(spark: SparkSession, output_root: str,
                       path: str) -> dict:
    """Rewrite the streamed tables into the partitioned serving layout
    (+ exact-constants sidecar), so ``lexindex.bm25_from_index``
    answers with PartitionFilters pruning.  Result-identical to the
    live index (the postings rows are the same relation; the sidecar's
    n_buckets is the streamed one, never a caller guess).  A stream
    that never committed compacts to a READABLE empty layout (plain
    empty parquet — an empty partitionBy write would leave a
    schema-less directory)."""
    import json
    import os
    posts = SnapshotTable(f"{output_root}/lex_postings").read(spark)
    n_docs, sum_dl, n_buckets = live_constants(spark, output_root)
    if posts is None:
        spark.createDataFrame([], _EMPTY_POSTS).repartition(1) \
            .write.mode("overwrite").parquet(path)
        n_buckets = max(n_buckets, 1)
    else:
        posts.write.mode("overwrite").partitionBy("bucket").parquet(path)
    stats = {"n_docs": n_docs, "sum_dl": sum_dl,
             "n_buckets": int(n_buckets)}
    with open(os.path.join(path, lexindex._STATS_FILE), "w") as fh:
        json.dump(stats, fh)
    return stats
