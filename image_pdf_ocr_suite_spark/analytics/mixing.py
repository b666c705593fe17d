"""Temperature-based corpus mixing (source-balanced sampling).

Pretraining mixtures up-weight small high-quality sources and
down-weight giant crawls: sample source *s* with probability
proportional to ``n_s^alpha`` (alpha < 1 flattens the source
distribution — the multinomial-temperature scheme used by the
multilingual-LM and open-corpus lines of work).  This module plans and
executes such a mixture deterministically and integer-exactly at
``alpha = 0.5``:

* ``weight_s = floor(sqrt(n_s))`` — IEEE-754 sqrt is correctly rounded,
  so Spark and DuckDB compute the identical integer (the repo's
  exact-int oracle discipline; a general ``n^alpha`` would hit
  cross-engine ``pow`` drift);
* the document budget ``T = floor(N * budget_bp / 10000)`` is allocated
  ``T_s = floor(T * weight_s / sum(weights))``;
* a document is sampled iff its md5 bucket (first 4 hex digits of
  ``md5(cast(id as string))`` mod 10000 — the stratified-sampling
  contract already pinned by analytics/sampling.py) falls below
  ``rate_bp_s = least(10000, floor(10000 * T_s / n_s))``.

Sampling is therefore a pure function of ``(id, source counts)``:
re-running yields the same corpus, appending new documents leaves old
verdicts unchanged (the md5 bucket is per-document), and every number
in the plan hash-checks across engines.

Scale: ``mixing_plan`` is one short-key count aggregate (one row per
source — a handful of rows at any corpus size; the unpartitioned
window summing the weights moves only those rows).  ``temperature_
sample`` broadcast-joins the tiny plan back onto the corpus and
filters map-side: documents never shuffle, the only data-sized work is
the scan.  Reference anchor: the reference processes documents
wholesale with no sampling; this operator is part of the task-mandated
training-data addendum (SURVEY.md §2.7) next to stratified /
token-budget sampling.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket_expr(id_col: str):
    """0..9999 md5 bucket — the sampling contract shared with
    analytics/sampling.py (hex prefix → int, mod 10000)."""
    return F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4),
                  16, 10).cast("bigint") % 10000


def mixing_plan(docs: DataFrame, budget_bp: int,
                source_col: str = "source",
                id_col: str = "doc_id") -> DataFrame:
    """Per-source mixture plan: ``(source, n_docs, weight, alloc,
    rate_bp)``, all BIGINT.  ``alloc`` is the sqrt-temperature share of
    the global budget; ``rate_bp`` the per-document sampling threshold.
    One count aggregate + one tiny window — nothing document-sized
    moves."""
    if not 0 < budget_bp <= 10000:
        raise ValueError("budget_bp must be in (0, 10000]")
    counts = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    w = F.floor(F.sqrt(F.col("n_docs"))).cast("bigint")
    counts = counts.withColumn("weight", w)
    win = Window.partitionBy()          # a handful of source rows
    # integer `div` end-to-end (round 6, ADVICE r5 #1): the former
    # double-division floor equals integer division only while
    # budget*weight stays under 2^53 — BIGINT div is exact to 2^63 and
    # mirrors the oracle's `//` verbatim.  Identical results in the
    # <2^53 regime, so the pinned oracle rows are unchanged.
    counts = (counts
              .withColumn("__tn", F.sum("n_docs").over(win))
              .withColumn("__tw", F.sum("weight").over(win)))
    out = counts.withColumn(
        "alloc",
        F.expr(f"CAST(((__tn * {int(budget_bp)}) div 10000) * weight "
               f"div __tw AS BIGINT)"))
    rate = F.expr("least(CAST(10000 AS BIGINT), "
                  "CAST((10000 * alloc) div n_docs AS BIGINT))")
    return out.withColumn("rate_bp", rate).drop("__tn", "__tw")


def temperature_sample(docs: DataFrame, budget_bp: int,
                       source_col: str = "source",
                       id_col: str = "doc_id") -> DataFrame:
    """The sampled corpus: input rows whose md5 bucket clears their
    source's ``rate_bp``.  The plan (a handful of rows) is explicitly
    broadcast — the corpus side never shuffles (CLAUDE round-5 rule:
    explicit ``F.broadcast``, never left to AQE when the stream side
    carries bodies)."""
    plan = mixing_plan(docs, budget_bp, source_col, id_col)
    plan = plan.select(source_col, "rate_bp")
    # NB (ADVICE r5 #4, resolved by documentation): the inner join is
    # deliberately NOT null-safe — a NULL ``source`` row never matches,
    # so it is excluded from the realized sample while mixing_plan
    # still reports it (n_sampled 0 in mixture_report).  That is
    # exactly what the SQL restatement (JOIN USING(source)) computes,
    # and the two engines must stay identical in every regime; callers
    # with NULL sources should coalesce to a sentinel first
    # (jobs/pipeline_job.py maps unparseable hosts to '').
    return (docs.join(F.broadcast(plan), on=source_col, how="inner")
                .where(_bucket_expr(id_col) < F.col("rate_bp"))
                .drop("rate_bp"))


def mixture_report(docs: DataFrame, budget_bp: int,
                   source_col: str = "source",
                   id_col: str = "doc_id") -> DataFrame:
    """Plan + realized counts in one result: ``(source, n_docs, weight,
    alloc, rate_bp, n_sampled)`` — the audit row a mixture job logs.
    The realized count aggregates the sampled slice's short keys."""
    plan = mixing_plan(docs, budget_bp, source_col, id_col)
    got = (temperature_sample(docs, budget_bp, source_col, id_col)
           .groupBy(source_col)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_sampled")))
    return (plan.join(got, on=source_col, how="left")
                .fillna({"n_sampled": 0}))
