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
                    test_grams: DataFrame | None = None,
                    impl: str = "ops") -> DataFrame:
    """Per-document first-reject verdicts ``(id, rej_at)`` — ``rej_at``
    is the 1-based ordinal of the first rejecting stage, NULL for an
    admitted document.  This is the shuffle-bearing half of the funnel
    (one exchange of integer triples); ``funnel_report`` folds it into
    the attrition table, and the streaming twin commits the admitted
    ids straight off it.  ``test_grams``: pre-hashed held-out grams
    (corpusprep.test_gram_table) so a stream hashes the static side
    once, not per micro-batch.

    ``impl='ops'`` (default) composes the five audited single-spelling
    operators — 5 column-pruned scans, one integer shuffle.
    ``impl='fused'`` is the production fusion the module docstring
    promises: ONE ``mapInPandas`` kernel re-deriving every gate signal
    per row (equivalence-pytest-pinned against the operator spelling,
    row-identical) — one scan, one Python crossing, ZERO shuffle; use
    it when the funnel is a stage inside a larger job rather than the
    audited report.  Requires a raw ``test_df`` (not ``test_grams``)
    and unique ids (the ops path's groupBy would merge duplicates)."""
    if impl == "fused":
        if test_grams is not None:
            raise ValueError("impl='fused' takes the raw test_df, "
                             "not test_grams")
        return _fused_verdicts(df, test_df, url_col, text_col, id_col,
                               langs, min_ratio_bp, max_ratio_bp, ngram_n)
    if impl != "ops":
        raise ValueError(f"unknown impl {impl!r}")
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


def _fused_verdicts(df: DataFrame, test_df: DataFrame | None,
                    url_col: str, text_col: str, id_col: str,
                    langs: tuple[str, ...],
                    min_ratio_bp: int, max_ratio_bp: int,
                    ngram_n: int) -> DataFrame:
    """The fused funnel kernel: every gate signal re-derived per row in
    one Arrow batch pass.  Each replication below cites the operator
    spelling it must match bit-for-bit (pinned by
    tests/test_funnel.py's fused==ops equivalence):

    - url gate   = corpusprep.url_quality_filter (host regex, blocklist
      suffix match, integer keyword score; Java replace and Python
      str.replace are both leftmost non-overlapping);
    - lang_id    = text.lang_id (padded stopword-hit count, >= 1);
    - gopher     = text.gopher_quality (integer cross-multiplied rules
      over the split(' ') token contract);
    - compression= corpusprep.compression_ratio ((10000*deflate)//utf8,
      shared compressed_len helper);
    - decontam   = corpusprep._decontaminate_probe (raw-gram set probe
      with the first-token prefilter; gram set built driver-side under
      the same bounded-broadcast contract).
    """
    import re as _re

    import pandas as pd

    from image_pdf_ocr_suite_spark.analytics.corpusprep import (
        URL_BLOCKLIST, URL_KEYWORD_WEIGHTS, URL_SCORE_THRESHOLD,
        compressed_len, held_out_gram_set)
    from image_pdf_ocr_suite_spark.analytics.text import GOPHER_STOP_WORDS

    if test_df is not None:
        # the shared probe-side gram contract (corpusprep helper — the
        # fused stage-5 can never diverge from _decontaminate_probe)
        gram_set, first_toks = held_out_gram_set(test_df, ngram_n,
                                                 text_col)
    else:
        gram_set, first_toks = frozenset(), frozenset()
    b = df.sparkSession.sparkContext.broadcast((gram_set, first_toks))

    id_type = df.schema[id_col].dataType.simpleString()
    host_re = _re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)")
    bullet_re = _re.compile(r"^[-•*] ")
    # Java rlike's unanchored `$` matches BEFORE one final line
    # terminator (CR, NEL U+0085, LS U+2028, PS U+2029 -- LF cannot
    # appear in a split('\\n') line); Python's `$` does not, so a CRLF
    # document's 'Read more...\\r' lines would diverge from the operator
    # spelling.  The optional terminator class restates Java's rule.
    ellip_re = _re.compile("(\\.\\.\\.|…)[\\r\\x85\\u2028\\u2029]?$")
    alpha_re = _re.compile(r"[A-Za-z]")
    lang_set = frozenset(langs)
    n = ngram_n

    def rej_at_of(url, text) -> int | None:
        # stage 1: URL gate (text never read — same as the operator)
        if isinstance(url, str):
            m = host_re.match(url)
            host = _re.sub(r"^www\.", "", m.group(1).lower()) if m else ""
            valid = bool(m) and m.group(1) != ""
            blocked = any(host == d or host.endswith("." + d)
                          for d in URL_BLOCKLIST)
            u_lc = url.lower()
            score = sum(w for kw, w in URL_KEYWORD_WEIGHTS if kw in u_lc)
            if (valid and blocked) or score >= URL_SCORE_THRESHOLD:
                return 1
        # stage 2: stopword-hit lang ID (NULL text -> 'other')
        if not isinstance(text, str):
            if "other" not in lang_set:
                return 2
            text = ""
        else:
            t2 = f" {text} "
            en = sum((len(t2) - len(t2.replace(f" {w} ", "")))
                     / (len(w) + 2) for w in ("the", "a", "and", "of"))
            pred = "en" if en >= 1 else "other"
            if pred not in lang_set:
                return 2
        # stage 3: Gopher rules (coalesce(text, '') like the operator)
        t = text
        toks = [x for x in t.split(" ") if x]
        lines = t.split("\n")
        n_words = len(toks)
        sum_wl = len(t.replace(" ", ""))
        n_lines = len(lines)
        n_bullet = sum(1 for ln in lines if bullet_re.match(ln))
        n_ellip = sum(1 for ln in lines if ellip_re.search(ln))
        n_alpha = sum(1 for x in toks if alpha_re.search(x))
        n_sym = (t.count("#") + (len(t) - len(t.replace("...", ""))) // 3
                 + t.count("…"))
        lt = {x.lower() for x in toks}
        n_stop = sum(1 for w in GOPHER_STOP_WORDS if w in lt)
        gpass = (50 <= n_words <= 100000
                 and 3 * n_words <= sum_wl <= 10 * n_words
                 and 10 * n_sym <= n_words
                 and 10 * n_bullet <= 9 * n_lines
                 and 10 * n_ellip <= 3 * n_lines
                 and 5 * n_alpha >= 4 * n_words
                 and n_stop >= 2)
        if not gpass:
            return 3
        # stage 4: deflate ratio bounds (NULL/empty text rejects)
        r = len(t.encode("utf-8"))
        if r == 0:
            return 4
        bp = (10000 * compressed_len(t)) // r
        if bp < min_ratio_bp or bp > max_ratio_bp:
            return 4
        # stage 5: held-out n-gram probe
        grams, firsts = b.value
        if grams and len(toks) >= n:
            for j in range(len(toks) - n + 1):
                if toks[j] in firsts and \
                        " ".join(toks[j:j + n]) in grams:
                    return 5
        return None

    def kernel(batches):
        for pdf in batches:
            vals = [rej_at_of(u, t)
                    for u, t in zip(pdf[url_col], pdf[text_col])]
            # nullable small ints: pd.array, never None+int -> float64
            yield pd.DataFrame({
                "id": pdf[id_col],
                "rej_at": pd.array(vals, dtype="Int32")})

    from image_pdf_ocr_suite_spark.partitioning import fan_out_small

    return fan_out_small(
        df.select(F.col(id_col), F.col(url_col), F.col(text_col))) \
        .mapInPandas(kernel, schema=f"id {id_type}, rej_at int")


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
                   ngram_n: int = 5, impl: str = "ops") -> DataFrame:
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
                        max_ratio_bp=max_ratio_bp, ngram_n=ngram_n,
                        impl=impl),
        df.sparkSession)
