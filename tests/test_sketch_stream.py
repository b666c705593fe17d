"""Streaming count-min ingest (streaming/sketch_stream.py).

Pins: the folded streaming sketch == the batch ``cm_build`` over the
static union ROW FOR ROW (integer merge is order-independent), point
estimates through the folded sketch obey count-min's one-sided
guarantee, and the replay guard makes a re-delivered micro-batch a
no-op (exactly-once across restarts).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics.sketches import cm_build, cm_estimate
from image_pdf_ocr_suite_spark.streaming.sketch_stream import (
    fold_sketch, live_sketch, start_cm_sketch_stream)
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable

SCHEMA = "doc_id long, text string"


def _rows():
    # heavy hitter 'alpha' (40), mid 'beta' (12), singletons u{i}
    rows = [(i, "alpha") for i in range(40)]
    rows += [(100 + i, "beta") for i in range(12)]
    rows += [(200 + i, f"u{i}") for i in range(20)]
    return rows


def test_stream_sketch_matches_batch(spark, tmp_path):
    docs = spark.createDataFrame(_rows(), SCHEMA)
    input_dir = str(tmp_path / "in")
    # three files -> multiple micro-batches (maxFilesPerTrigger=4 caps,
    # availableNow drains all)
    docs.where("doc_id < 20").coalesce(1).write.mode("append").parquet(input_dir)
    docs.where("doc_id >= 20 AND doc_id < 110").coalesce(1) \
        .write.mode("append").parquet(input_dir)
    docs.where("doc_id >= 110").coalesce(1).write.mode("append").parquet(input_dir)

    out_root = str(tmp_path / "out")
    q = start_cm_sketch_stream(spark, input_dir, SCHEMA, out_root,
                               str(tmp_path / "ckpt"), depth=3, width=64)
    q.awaitTermination(120)

    table = SnapshotTable(f"{out_root}/cm_partials")
    folded = live_sketch(spark, out_root)
    got = {(r["row"], r["bucket"]): r["cnt"] for r in folded.collect()}
    want = {(r["row"], r["bucket"]): r["cnt"]
            for r in cm_build(docs.select("text"), "text",
                              depth=3, width=64).collect()}
    assert got == want

    # estimates through the folded sketch: one-sided, exact for the
    # heavy hitter unless a collision inflates it
    probes = spark.createDataFrame([("alpha",), ("beta",), ("zzz",)],
                                   "text string")
    est = {r["text"]: r["est_count"]
           for r in cm_estimate(folded, probes, "text",
                                depth=3, width=64).collect()}
    assert est["alpha"] >= 40 and est["beta"] >= 12
    # total mass bounds any estimate
    assert max(est.values()) <= 72

    # exactly-once: re-delivering a committed batch is a no-op
    import image_pdf_ocr_suite_spark.streaming.sketch_stream as ss
    partial = cm_build(docs.select("text"), "text", depth=3, width=64)
    assert ss._batch_committed(table, "cm-batch-0")
    n_before = table.read(spark).count()
    # simulate the foreachBatch replay path: guard fires, no append
    if not ss._batch_committed(table, "cm-batch-0"):
        table.append(partial, run_id="cm-batch-0")
    assert table.read(spark).count() == n_before


def test_live_sketch_empty_before_first_commit(spark, tmp_path):
    # no snapshot yet: an empty sketch (zero estimates), not an error
    folded = live_sketch(spark, str(tmp_path / "nothing"))
    assert folded.count() == 0
    probes = spark.createDataFrame([("x",)], "text string")
    est = cm_estimate(folded, probes, "text", depth=3, width=64).collect()
    assert est[0]["est_count"] == 0


def test_fold_is_batch_order_independent(spark):
    docs = spark.createDataFrame(_rows(), SCHEMA)
    a = cm_build(docs.where("doc_id < 100").select("text"), "text",
                 depth=3, width=64)
    b = cm_build(docs.where("doc_id >= 100").select("text"), "text",
                 depth=3, width=64)
    ab = {(r["row"], r["bucket"]): r["cnt"]
          for r in fold_sketch(a.unionByName(b)).collect()}
    ba = {(r["row"], r["bucket"]): r["cnt"]
          for r in fold_sketch(b.unionByName(a)).collect()}
    whole = {(r["row"], r["bucket"]): r["cnt"]
             for r in cm_build(docs.select("text"), "text",
                               depth=3, width=64).collect()}
    assert ab == ba == whole


def test_stream_hll_matches_batch(spark, tmp_path):
    from image_pdf_ocr_suite_spark.analytics.hll import (hll_estimate,
                                                         hll_registers)
    from image_pdf_ocr_suite_spark.streaming.sketch_stream import (
        live_hll, start_hll_sketch_stream)

    rows = [(i, "en" if i % 3 else "ja", f"v{i % 37}") for i in range(90)]
    schema = "doc_id long, lang string, text string"
    docs = spark.createDataFrame(rows, schema)
    input_dir = str(tmp_path / "in")
    docs.where("doc_id < 40").coalesce(1).write.mode("append").parquet(input_dir)
    docs.where("doc_id >= 40").coalesce(1).write.mode("append").parquet(input_dir)

    out_root = str(tmp_path / "out")
    q = start_hll_sketch_stream(spark, input_dir, schema, out_root,
                                str(tmp_path / "ckpt"), p=7)
    q.awaitTermination(120)

    folded = live_hll(spark, out_root)
    got = {(r["lang"], r["bucket"]): r["r"] for r in folded.collect()}
    want = {(r["lang"], r["bucket"]): r["r"]
            for r in hll_registers(docs, "text", p=7,
                                   group_cols=["lang"]).collect()}
    assert got == want
    # estimates through the folded registers equal the batch estimates
    ge = {r["lang"]: r["est_distinct"]
          for r in hll_estimate(folded, p=7, group_cols=["lang"]).collect()}
    be = {r["lang"]: r["est_distinct"]
          for r in hll_estimate(
              hll_registers(docs, "text", p=7, group_cols=["lang"]),
              p=7, group_cols=["lang"]).collect()}
    assert ge == be

    # empty table reads as an empty register set
    assert live_hll(spark, str(tmp_path / "nothing")).count() == 0
