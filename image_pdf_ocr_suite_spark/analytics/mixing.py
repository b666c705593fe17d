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
    total_n = F.sum("n_docs").over(win)
    total_w = F.sum("weight").over(win)
    budget = F.floor(total_n * F.lit(int(budget_bp)) / F.lit(10000))
    alloc = F.floor(budget * F.col("weight") / total_w).cast("bigint")
    out = counts.withColumn("alloc", alloc)
    rate = F.least(F.lit(10000).cast("bigint"),
                   F.floor(F.lit(10000) * F.col("alloc") / F.col("n_docs"))
                    .cast("bigint"))
    return out.withColumn("rate_bp", rate)


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
