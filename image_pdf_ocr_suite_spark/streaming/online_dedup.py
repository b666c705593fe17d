"""Online near-dup admission: continuous corpus deduplication against a
growing index, exactly-once.

The batch pipeline dedups a corpus it can see whole
(``dedup.verified_near_dup_losers`` → component-min keepers); a
production ingest never sees the whole corpus — documents arrive in
batches and each batch must be admitted or rejected against everything
ALREADY admitted.  This module is that twin, composed from the same
library pieces:

1. within the micro-batch: component-min keepers over Jaccard-verified
   LSH pairs (``verified_near_dup_losers`` — the batch policy, applied
   to the only scope where the batch pipeline's semantics are
   available);
2. against history: the batch's survivors probe the accumulated
   signature table (``dedup.dedup_against_index`` with the snapshot
   relation as the index) and any survivor that Jaccard-verifies
   ≥ threshold against an ADMITTED document is rejected — first batch
   wins, the greedy online policy;
3. the remaining documents append to ``admitted`` (the deduplicated
   corpus — the output) and their signatures to ``signatures``, both
   exactly-once under the stream.py replay guard, two-table convention.

Admission law (pinned by tests/test_online_dedup.py against an
independent single-process greedy replay): a document is admitted iff
it survives component-min within its own batch AND no LSH-candidate
pair with an earlier-admitted document verifies ≥ threshold.  Note the
chain consequence, inherent to ANY online dedup: if b (≈a) was
rejected in batch 1, a later c ≈ b but ≉ a IS admitted — b is not in
the corpus to match against.

Crash-replay determinism: if the crash lands between the two appends,
the replayed batch recomputes the same survivor set — the partially
committed ``admitted`` table already contains this batch's rows, but a
survivor probing them meets only (i) itself (excluded as a self-match
by id) and (ii) fellow survivors, which by construction verify below
threshold — so the recomputed set is identical and only the
uncommitted table appends.

Scale shape: per batch only the BATCH pays signature compute; the
probe joins the batch's (band, minhash) sliver against the signature
relation and verification joins only candidate ids' texts — admitted
text never rides a shuffle wholesale.  State grows with the admitted
corpus (inherent: that IS the index), partitioned by band in the
compacted serving layout (``compact_to_index``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import dedup
from image_pdf_ocr_suite_spark.streaming.stream import _batch_committed
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable

_SIG_SCHEMA = "index_id bigint, band int, minhash string"


def start_online_dedup_stream(spark: SparkSession, input_dir: str,
                              schema, output_root: str,
                              checkpoint_dir: str,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              threshold: float = 0.5,
                              n_hashes: int = 4, shingle_k: int = 3,
                              available_now: bool = True):
    """Continuous dedup admission: parquet document stream → admitted
    corpus + signature index, exactly-once.  Returns the
    StreamingQuery; read the deduplicated corpus with
    ``admitted_corpus`` (empty-safe before the first commit)."""
    adm_table = SnapshotTable(f"{output_root}/admitted")
    sig_table = SnapshotTable(f"{output_root}/signatures")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        run_id = f"dedup-batch-{batch_id}"
        adm_done = _batch_committed(adm_table, run_id)
        sig_done = _batch_committed(sig_table, run_id)
        if adm_done and sig_done:
            return
        sess = batch_df.sparkSession
        # ONE signature kernel pass per batch, pinned and reused by all
        # three consumers (within-batch pairs, history probe, append) —
        # the module's per-batch cost contract (review fix)
        batch_sig = dedup.minhash_signature(
            batch_df, text_col, id_col, n_hashes, shingle_k) \
            .localCheckpoint()
        # 1) within-batch component-min keepers (the batch policy)
        losers = dedup.verified_near_dup_losers(
            batch_df, text_col, id_col, threshold=threshold,
            n_hashes=n_hashes, shingle_k=shingle_k, sig=batch_sig)
        kept = batch_df.join(losers, id_col, "left_anti")
        kept_sig = batch_sig.join(kept.select(id_col), id_col, "left_semi")
        # 2) greedy first-batch-wins against the admitted history
        sigs = sig_table.read(sess)
        adm = adm_table.read(sess)
        if sigs is not None and adm is not None:
            rejected = dedup.dedup_against_index(
                kept, sess, None, text_col, id_col,
                n_hashes=n_hashes, shingle_k=shingle_k,
                threshold=threshold,
                corpus_docs=adm.select(id_col, text_col),
                index_df=sigs, sig=kept_sig).select(
                    F.col("new_id").alias(id_col)).distinct()
            kept = kept.join(rejected, id_col, "left_anti")
            kept_sig = kept_sig.join(kept.select(id_col), id_col,
                                     "left_semi")
        kept = kept.localCheckpoint()  # two consumers + replay identity
        if not adm_done:
            adm_table.append(kept, run_id=run_id)
        if not sig_done:
            sig_table.append(
                kept_sig.withColumnRenamed(id_col, "index_id"),
                run_id=run_id)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "4").parquet(input_dir))
    writer = (stream.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def admitted_corpus(spark: SparkSession, output_root: str,
                    schema: str = "doc_id bigint, text string"
                    ) -> DataFrame:
    """The deduplicated corpus so far; empty before the first commit."""
    adm = SnapshotTable(f"{output_root}/admitted").read(spark)
    if adm is None:
        adm = spark.createDataFrame([], schema)
    return adm


def compact_to_index(spark: SparkSession, output_root: str,
                     path: str) -> None:
    """Rewrite the streamed signature table into the band-partitioned
    serving layout, after which ``dedup.dedup_against_index(path=...)``
    probes it with partition pruning — the same stream → compact →
    serve lifecycle as the lexical index."""
    sigs = SnapshotTable(f"{output_root}/signatures").read(spark)
    if sigs is None:
        # a never-started stream compacts to a READABLE empty layout —
        # an empty partitionBy write leaves a schema-less directory
        spark.createDataFrame([], _SIG_SCHEMA).repartition(1) \
            .write.mode("overwrite").parquet(path)
        return
    sigs.write.mode("overwrite").partitionBy("band").parquet(path)
