"""Quality-funnel composition (analytics/funnel.py): attrition
arithmetic, first-reject attribution, and the sequential-filter
equivalence the docstring promises."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import funnel
from image_pdf_ocr_suite_spark.analytics import corpusprep
from image_pdf_ocr_suite_spark.analytics import text as textops


def _docs(spark):
    """Hand-built corpus hitting every stage: doc 1 keeps, 2 fails the
    URL gate, 3 fails lang, 4 fails gopher (short), 5 fails compression
    (repetitive), 6 is contaminated, 7 fails BOTH url and gopher (must
    count once, at url)."""
    good = ("the quick brown fox jumps over the lazy dog and then "
            "the dog turns around to have a look at the fox with "
            "great interest because that is what dogs do every day "
            "when they meet a fox that has jumped over them and "
            "fifty more words of plain english text that have the "
            "usual mix of short and long words with sensible length "
            "and structure to pass the gopher rules easily today "
            "indeed my friends this text is long enough now yes")
    rows = [
        (1, "https://news.example.org/a", good + " unique one."),
        (2, "https://downloads.badsite.example/x", good + " unique two."),
        (3, "https://ok.example.org/b", "voila un texte sans mots anglais "
            "frequents vraiment tres long pour rien du tout ici bas"),
        (4, "https://ok.example.org/c", "the short one that we have with."),
        (5, "https://ok.example.org/d", good + " " + "spam spam " * 200),
        (6, "https://ok.example.org/e",
         "every held out row needs its own long and fully distinct "
         "body of plain english prose because any shared five gram "
         "with the training corpus would mark other documents as "
         "contaminated too and that is not what this fixture wants "
         "to exercise here so these fifty or more words have been "
         "written to be different from the good text in every single "
         "window while still passing the gopher rules with the usual "
         "stop words that sentences have with them in normal prose"),
        (7, "https://downloads.badsite.example/y", "the tiny have with."),
    ]
    return spark.createDataFrame(rows, "doc_id int, url string, text string")


def test_funnel_attrition_arithmetic(spark):
    d = _docs(spark)
    test = d.where(F.col("doc_id") == 6).select("doc_id", "url", "text")
    out = {r["stage"]: r for r in
           funnel.quality_funnel(d, test_df=test).collect()}
    assert [out[s]["stage_ord"] for s in funnel.FUNNEL_STAGES] == [1, 2, 3, 4, 5]
    # chain invariant: n_out(k) == n_in(k+1), n_in - n_rejected == n_out
    for i, s in enumerate(funnel.FUNNEL_STAGES):
        assert out[s]["n_in"] - out[s]["n_rejected"] == out[s]["n_out"]
        if i:
            assert out[funnel.FUNNEL_STAGES[i - 1]]["n_out"] == out[s]["n_in"]
    assert out["url_filter"]["n_in"] == 7
    assert out["url_filter"]["n_rejected"] == 2        # docs 2 and 7
    assert out["lang_id"]["n_rejected"] == 1           # doc 3
    assert out["gopher"]["n_rejected"] == 1            # doc 4 (7 already gone)
    assert out["compression"]["n_rejected"] == 1       # doc 5
    assert out["decontaminate"]["n_rejected"] == 1     # doc 6 (self-hit)
    assert out["decontaminate"]["n_out"] == 1          # doc 1 admitted


def test_funnel_matches_sequential_filters(spark):
    """First-reject attribution == literally running the gates as
    sequential filters on survivor sets."""
    d = _docs(spark)
    out = {r["stage"]: r for r in funnel.quality_funnel(d).collect()}

    ids = set(r["doc_id"] for r in d.select("doc_id").collect())
    u = {r["doc_id"]: r["verdict"]
         for r in corpusprep.url_quality_filter(d).collect()}
    l = {r["doc_id"]: r["pred_lang"] for r in textops.lang_id(d).collect()}
    g = {r["doc_id"]: r["gopher_pass"]
         for r in textops.gopher_quality(d).collect()}
    c = {r["doc_id"]: r["ratio_bp"]
         for r in corpusprep.compression_ratio(d).collect()}
    gates = [
        ("url_filter", lambda i: u[i] != "keep"),
        ("lang_id", lambda i: l[i] != "en"),
        ("gopher", lambda i: g[i] == 0),
        ("compression", lambda i: c[i] is None or not 4300 <= c[i] <= 9000),
        ("decontaminate", lambda i: False),            # no test_df passed
    ]
    surv = set(ids)
    for name, rej in gates:
        dropped = {i for i in surv if rej(i)}
        assert out[name]["n_in"] == len(surv), name
        assert out[name]["n_rejected"] == len(dropped), name
        surv -= dropped
        assert out[name]["n_out"] == len(surv), name


def test_funnel_no_test_df_stage5_zero(spark):
    d = _docs(spark)
    out = {r["stage"]: r for r in funnel.quality_funnel(d).collect()}
    assert out["decontaminate"]["n_rejected"] == 0


def test_funnel_plan_single_data_shuffle(spark):
    """The only data-sized exchange is the (id, stage, rej) triple
    shuffle; text gates stay map-only over the scans (no join on the
    document side before aggregation)."""
    d = _docs(spark)
    plan = funnel.quality_funnel(d)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "Union" in plan


def _test_df(spark):
    # doc 6's first sentence as the held-out slice -> doc 6 contaminated
    return spark.createDataFrame(
        [("t1", "every held out row needs its own long and fully "
          "distinct body of plain english prose")],
        "url string, text string")


def test_fused_equals_ops_on_fixture(spark):
    d = _docs(spark)
    t = _test_df(spark)
    ops = {r["id"]: r["rej_at"]
           for r in funnel.funnel_verdicts(d, t).collect()}
    fused = {r["id"]: r["rej_at"]
             for r in funnel.funnel_verdicts(d, t, impl="fused").collect()}
    assert fused == ops
    assert ops[2] == 1 and ops[3] == 2 and ops[4] == 3 and ops[5] == 4
    assert ops[6] == 5 and ops[7] == 1 and ops[1] is None


def test_fused_equals_ops_on_adversarial_rows(spark):
    rows = [
        (10, None, "the a and of " * 30),           # null url
        (11, "https://x.example.org/", None),        # null text
        (12, "https://x.example.org/", ""),          # empty text
        (13, "notaurl casino poker", "the a and of " * 30),  # invalid+spam
        (14, "https://WWW.Badsite.Example/z", "x"),  # case + www prefix
        (15, "https://sub.badsite.example/z", "x"),  # subdomain suffix
    ]
    d = spark.createDataFrame(rows, "doc_id int, url string, text string")
    ops = {r["id"]: r["rej_at"] for r in funnel.funnel_verdicts(d).collect()}
    fused = {r["id"]: r["rej_at"]
             for r in funnel.funnel_verdicts(d, impl="fused").collect()}
    assert fused == ops
    # pinned: spam-scored invalid url rejects at 1; blocklist matches are
    # case-normalized and any-subdomain
    assert ops[13] == 1 and ops[14] == 1 and ops[15] == 1


def test_fused_equals_ops_on_synth_corpus(spark):
    # the sf0.001 documents table: the real driver-query surface
    d = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
         .select("doc_id", F.concat(F.lit("https://host"),
                                    (F.col("doc_id") % 7).cast("string"),
                                    F.lit(".example.org/p/"),
                                    F.col("doc_id").cast("string"))
                 .alias("url"), "text"))
    t = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
         .where("doc_id % 499 = 7").select(
             F.col("doc_id").cast("string").alias("url"), "text"))
    ops = {r["id"]: r["rej_at"]
           for r in funnel.funnel_verdicts(d, t).collect()}
    fused = {r["id"]: r["rej_at"]
             for r in funnel.funnel_verdicts(d, t, impl="fused").collect()}
    assert fused == ops and len(ops) == 500


def test_fused_plan_no_shuffle(spark):
    d = _docs(spark)
    plan = funnel.funnel_verdicts(d, impl="fused") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1


def test_fused_equals_ops_on_crlf_line_terminators(spark):
    """Java rlike's `$` matches before one final line terminator (CR,
    NEL, LS, PS); Python's does not — the fused ellipsis rule must
    restate the Java semantics or CRLF documents diverge at stage 3."""
    base = ("the quick brown fox jumps over the lazy dog and then "
            "the dog turns around to have a look at the fox with "
            "great interest because that is what dogs do every day "
            "when they meet a fox that has jumped over them and " * 2)
    crlf_doc = "\r\n".join(
        [base + "line one of this document ends with dots..."] * 4
        + [base + "and the last line is plain"])
    rows = [
        (20, "https://x.example.org/a", crlf_doc),
        (21, "https://x.example.org/b", base + "ends with dots...\r"),
        (22, "https://x.example.org/c", base + "nel terminated...\x85"),
        (23, "https://x.example.org/d", base + "ls terminated... "),
        (24, "https://x.example.org/e", base + "double cr...\r\r"),
    ]
    d = spark.createDataFrame(rows, "doc_id int, url string, text string")
    ops = {r["id"]: r["rej_at"] for r in funnel.funnel_verdicts(d).collect()}
    fused = {r["id"]: r["rej_at"]
             for r in funnel.funnel_verdicts(d, impl="fused").collect()}
    assert fused == ops
    # the CRLF doc: 4 of 5 lines end '...\r' -> ellipsis rule trips in
    # BOTH spellings (10*4 > 3*5)
    assert ops[20] == 3
