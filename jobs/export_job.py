"""Training-shard export job — the final mile of the corpus pipeline.

    clean corpus (id, text)                       corpus_job output / documents
      -> overlapping token chunks                 analytics.text.chunk_documents
      -> [optional] cluster-balance quota         analytics.sampling (embeddings)
      -> deterministic shard assignment           md5(id) % n_shards
      -> per-shard context-window packing         the pack_chunks arithmetic,
         (concat-and-split at fixed capacity)     text carried this time
      -> snapshot-committed shard table           tableio.snapshot
         (shard, bin_id, window_text, n_chunks, n_tokens, source_ids)
      -> shard manifest                           per-shard window/token totals

Every packed window carries its PROVENANCE (the ordered source doc ids)
so a training run can be audited back to documents — the thing a 100 TB
pipeline needs when a bad document surfaces downstream.

Determinism: shard = md5 bucket of the id, pack order = (id, chunk_idx)
— reproducible across runs, engines, and partitionings, so a re-export
of the same corpus is byte-stable and the snapshot replay guard makes
re-running a committed run_id a no-op.  One shuffle keyed on shard
(the packing window), then the grouped assembly — chunk text rides the
shuffle exactly once.

    spark-submit --py-files pkg.zip jobs/export_job.py \
        --input-table clean.parquet --output-root /out \
        [--capacity 256] [--n-shards 32] [--chunk-tokens 50]
        [--overlap 10] [--id-col url] [--text-col text]
"""

from __future__ import annotations

import argparse
import sys
import uuid

from pyspark.sql import DataFrame, Window, functions as F

from image_pdf_ocr_suite_spark.analytics.text import (chunk_documents,
                                                      md5_bucket_expr)
from image_pdf_ocr_suite_spark.session import build_session
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable


# provenance join/split delimiter: U+001F (unit separator) — absent
# from URLs and any sane document id, unlike ","
SOURCE_IDS_SEP = "\x1f"


def pack_windows(docs: DataFrame, capacity: int = 256, n_shards: int = 32,
                 chunk_tokens: int = 50, overlap: int = 10,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(shard, bin_id, window_text, n_chunks, n_tokens, source_ids) —
    the pack_chunks binning arithmetic (floor(tokens_before/capacity)
    per shard) with the chunk TEXT carried into an ordered assembly, so
    the output is actual training windows, not just bin statistics.
    ``source_ids`` is the in-order provenance.

    Pack-order contract: chunks pack in (STRING-cast id, chunk_idx)
    order — the id must be stringified anyway for the md5 shard bucket,
    and string order is the cross-engine-stable total order the oracle
    pins.  NOTE this diverges from corpusprep.pack_chunks (which orders
    by the native-typed id) for NUMERIC ids of mixed digit count
    ("10" < "2" lexicographically): the two operators are separately
    oracle-pinned contracts, not interchangeable reports."""
    chunks = chunk_documents(docs, text_col=text_col, id_col=id_col,
                             chunk_tokens=chunk_tokens, overlap=overlap)
    base = chunks.select(
        md5_bucket_expr(id_col, n_shards).alias("shard"),
        F.col(id_col).cast("string").alias("__id"),
        F.col("chunk_idx"), F.col("chunk_text"), F.col("chunk_tokens"))
    w = (Window.partitionBy("shard").orderBy("__id", "chunk_idx")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("chunk_tokens").over(w)
    binned = base.select(
        "shard",
        ((cum - F.col("chunk_tokens")) / F.lit(capacity)).cast("long")
        .alias("bin_id"),
        F.struct("__id", "chunk_idx", "chunk_text").alias("__pc"),
        F.col("chunk_tokens"), F.col("__id"))
    return binned.groupBy("shard", "bin_id").agg(
        F.concat_ws(" ", F.transform(F.array_sort(F.collect_list("__pc")),
                                     lambda x: x["chunk_text"]))
         .alias("window_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("chunk_tokens").cast("bigint").alias("n_tokens"),
        # provenance as a sorted joined string (cross-engine-stable
        # scalar; the manifest re-splits it).  Delimiter = the ASCII
        # unit separator: a comma would corrupt provenance for ids that
        # legally contain one (e.g. --id-col url with query strings)
        F.array_join(F.array_sort(F.collect_set("__id")), SOURCE_IDS_SEP)
         .alias("source_ids"))


def shard_manifest(windows: DataFrame) -> DataFrame:
    """Per-shard audit row: (shard, n_windows, n_tokens, n_docs)."""
    return (windows.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(F.flatten(
            F.collect_list(F.split("source_ids", SOURCE_IDS_SEP)))))
         .cast("bigint").alias("n_docs"))
        .orderBy("shard"))


def main(argv: list[str] | None = None, *,
         stop_session: bool = True) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-table", required=True)
    ap.add_argument("--output-root", required=True)
    ap.add_argument("--capacity", type=int, default=256)
    ap.add_argument("--n-shards", type=int, default=32)
    ap.add_argument("--chunk-tokens", type=int, default=50)
    ap.add_argument("--overlap", type=int, default=10)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args(argv)

    spark = build_session(app="export-job")
    run_id = args.run_id or uuid.uuid4().hex[:12]
    shards_tbl = SnapshotTable(f"{args.output_root}/shards")
    manifest_tbl = SnapshotTable(f"{args.output_root}/manifest")
    windows = pack_windows(
        spark.read.parquet(args.input_table),
        capacity=args.capacity, n_shards=args.n_shards,
        chunk_tokens=args.chunk_tokens, overlap=args.overlap,
        id_col=args.id_col, text_col=args.text_col)
    # persist: the shards append and the manifest aggregate must not
    # execute the chunk-explode + packing-window pipeline twice (its
    # window shuffle carries all chunk text — the job's dominant cost)
    windows = windows.persist()
    try:
        # per-table replay guard: re-running a committed run_id is a
        # no-op (exactly-once across restarts, the streaming convention)
        for tbl, df in ((shards_tbl, windows),
                        (manifest_tbl, shard_manifest(windows))):
            if any(s.run_id == run_id for s in tbl.snapshots()):
                continue
            tbl.append(df, run_id=run_id)
    finally:
        windows.unpersist()
    if stop_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
