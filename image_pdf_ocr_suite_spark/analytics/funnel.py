"""Quality funnel — the composed corpus-admission pipeline with
per-stage attrition accounting.

The RefinedWeb/Dolma "mixer" shape (Penedo et al. 2023 §3; Soldaini et
al. 2024): a document enters training only after passing, in order, the
URL gate, language ID, the Gopher quality rules, the compression-ratio
repetitiveness/hash-soup bounds, and test-set decontamination — and the
pipeline's primary *report* is the attrition table: how many documents
each stage saw and how many it rejected.  This module composes the
engine's existing single-spelling operators (corpusprep.url_quality_filter,
text.lang_id, text.gopher_quality, corpusprep.compression_ratio,
corpusprep.decontaminate_ngrams) into exactly that report.

Scale shape (10^12 documents): every gate is map-only over the scan
(the URL gate never reads the body column; decontamination broadcasts
the test-set n-gram digests), so the only data-sized movement is ONE
shuffle of (id, stage_ord, rejected) integer triples for the
first-reject attribution, followed by a <=6-row histogram.  Documents
are attributed to the FIRST stage that rejects them — arithmetically
identical to running the stages as sequential filters, without
re-scanning survivors per stage.  The text column is read once per
text-gate (column-pruned scans); a production deployment fuses the
three Catalyst text gates into one projection, which this module keeps
separate to preserve the operators' single audited spelling.

Reference parity note: the reference CLI (ocr.py) reports per-run
document/page accept+quarantine counts; this is that accounting
generalized to the multi-gate corpus-admission pipeline the north rule
targets.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from image_pdf_ocr_suite_spark.analytics import corpusprep
from image_pdf_ocr_suite_spark.analytics import text as textops

FUNNEL_STAGES = ("url_filter", "lang_id", "gopher", "compression",
                 "decontaminate")


def funnel_verdicts(df: DataFrame, test_df: DataFrame | None = None,
                    url_col: str = "url", text_col: str = "text",
                    id_col: str = "doc_id",
                    langs: tuple[str, ...] = ("en",),
                    min_ratio_bp: int = 4300, max_ratio_bp: int = 9000,
                    ngram_n: int = 5, *,
                    test_grams: DataFrame | None = None) -> DataFrame:
    """Per-document first-reject verdicts ``(id, rej_at)`` — ``rej_at``
    is the 1-based ordinal of the first rejecting stage, NULL for an
    admitted document.  This is the shuffle-bearing half of the funnel
    (one exchange of integer triples); ``funnel_report`` folds it into
    the attrition table, and the streaming twin commits the admitted
    ids straight off it.  ``test_grams``: pre-hashed held-out grams
    (corpusprep.test_gram_table) so a stream hashes the static side
    once, not per micro-batch."""
    def leg(frame: DataFrame, ord_: int, rej) -> DataFrame:
        return frame.select(
            F.col(id_col).alias("id"),
            F.lit(ord_).alias("stage_ord"),
            rej.cast("int").alias("rej"))

    u = corpusprep.url_quality_filter(df, url_col=url_col, id_col=id_col)
    l = textops.lang_id(df, text_col=text_col, id_col=id_col)
    g = textops.gopher_quality(df, text_col=text_col, id_col=id_col)
    r = corpusprep.compression_ratio(df, text_col=text_col, id_col=id_col)
    legs = [
        leg(u, 1, F.col("verdict") != "keep"),
        leg(l, 2, ~F.col("pred_lang").isin(*langs)),
        leg(g, 3, F.col("gopher_pass") == 0),
        leg(r, 4, (F.col("ratio_bp").isNull()
                   | (F.col("ratio_bp") < min_ratio_bp)
                   | (F.col("ratio_bp") > max_ratio_bp))),
    ]
    if test_df is not None or test_grams is not None:
        # raw test frame -> the zero-hash set-probe path (the md5 gram
        # kernel was the funnel's measured floor stage — 0.76 per-stage
        # scaling at 1M docs, BENCH/BASELINE.md 2026-08-18); precomputed
        # md5 test_grams (the streaming twin) keep the join path
        dec = corpusprep.decontaminate_ngrams(
            df, test_df, n=ngram_n, text_col=text_col, id_col=id_col,
            impl="probe" if test_grams is None else "arrow",
            test_grams=test_grams)
        legs.append(leg(dec, 5, F.lit(True)))

    long = reduce(DataFrame.unionByName, legs)
    return long.groupBy("id").agg(
        F.min(F.when(F.col("rej") == 1, F.col("stage_ord"))).alias("rej_at"))


def funnel_report(verdicts: DataFrame, spark=None) -> DataFrame:
    """(id, rej_at) -> the 5-row attrition table
    ``(stage_ord, stage, n_in, n_rejected, n_out)`` via the <=6-row
    rej_at histogram crossed with the literal stage table."""
    spark = spark or verdicts.sparkSession
    hist = verdicts.groupBy("rej_at").agg(F.count("*").alias("c"))
    stages = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(FUNNEL_STAGES)],
        "stage_ord int, stage string")
    n_in = F.sum(F.when(F.col("rej_at").isNull()
                        | (F.col("rej_at") >= F.col("stage_ord")),
                        F.col("c")).otherwise(0)).cast("bigint")
    n_rej = F.sum(F.when(F.col("rej_at") == F.col("stage_ord"),
                         F.col("c")).otherwise(0)).cast("bigint")
    out = (stages.crossJoin(hist)
           .groupBy("stage_ord", "stage")
           .agg(n_in.alias("n_in"), n_rej.alias("n_rejected")))
    return out.select(
        "stage_ord", "stage", "n_in", "n_rejected",
        (F.col("n_in") - F.col("n_rejected")).cast("bigint").alias("n_out"))


def quality_funnel(df: DataFrame, test_df: DataFrame | None = None,
                   url_col: str = "url", text_col: str = "text",
                   id_col: str = "doc_id",
                   langs: tuple[str, ...] = ("en",),
                   min_ratio_bp: int = 4300, max_ratio_bp: int = 9000,
                   ngram_n: int = 5) -> DataFrame:
    """(url, text) documents -> the 5-row attrition table
    ``(stage_ord int, stage, n_in, n_rejected, n_out)`` with
    ``n_out(k) == n_in(k+1)`` and ``n_out`` of the last stage the
    admitted-corpus size.

    Stage gates (reject conditions), in funnel order:

    1. ``url_filter``  — URL verdict != 'keep' (blocklist / spam score).
    2. ``lang_id``     — predicted language not in ``langs``.
    3. ``gopher``      — composite ``gopher_pass == 0``.
    4. ``compression`` — deflate ratio_bp NULL (empty) or outside
       ``[min_ratio_bp, max_ratio_bp]`` (too repetitive / hash soup).
    5. ``decontaminate`` — shares any word ``ngram_n``-gram with
       ``test_df`` (skipped when ``test_df`` is None: 0 rejects).

    Every gate is evaluated map-only over the full input; attribution
    to the first rejecting stage reproduces sequential-filter counts
    exactly (a doc rejected by stages 2 and 4 counts once, at 2).
    """
    return funnel_report(
        funnel_verdicts(df, test_df, url_col=url_col, text_col=text_col,
                        id_col=id_col, langs=langs,
                        min_ratio_bp=min_ratio_bp,
                        max_ratio_bp=max_ratio_bp, ngram_n=ngram_n),
        df.sparkSession)
