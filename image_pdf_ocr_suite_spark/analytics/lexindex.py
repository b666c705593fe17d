"""Materialized inverted index + BM25 probe — the lexical twin of the
ANN index layouts (similarity.ivf_write_index / lsh_write_banded_index).

``analytics.text.bm25_scores`` scans the whole corpus per query — right
for one-off scoring, wrong for a query workload.  The 100 TB shape is
the classic posting-list layout: tokenize ONCE, persist
``(term, doc_id, tf, dl)`` postings partitioned by a stable term-hash
bucket, and answer each query by reading only the probed buckets —
PartitionFilters-level pruning (len(query_terms)/n_buckets of the
files), with the term equality pushed into the parquet scan.  Document
length rides denormalized in the posting row (the standard trick: BM25
normalization needs dl, and a doc-length join would shuffle doc-sized
state).  Corpus constants (N, Σdl) live in an underscore-prefixed JSON
sidecar like the IVF quantizer.

Scale shape:

- build: ONE explode + (term, doc, dl) group — the one corpus-sized
  shuffle, amortized over every query (same contract as the ANN index
  builds);
- probe: pruned scan → per-term df aggregate (≤ len(terms) rows) →
  broadcast join back → per-doc pivoted fixed-order contribution sum —
  the only exchange carries (doc_id, dl, tf) integer rows for the
  matching sliver of the corpus;
- append: new docs' postings append under the same bucketing; the
  sidecar constants update exactly (exact-integer adds).

Determinism: identical expression nesting as ``text.bm25_scores`` (tf,
dl, df, N exact integers; per-term contributions summed in FIXED
literal term order via one-row ``sum(when(term=t, contrib))`` pivots),
so the probe is BIT-identical to the full-scan operator on the hit set
— pinned by tests/test_lexindex.py.

Reference: the suite has no retrieval layer; this is a task-mandated
LLM-pipeline addition (seed-query corpus mining) next to bm25_scores.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .sketches import hash48_expr

_STATS_FILE = "_lex_stats.json"


def term_bucket(term: str, n_buckets: int) -> int:
    """Python twin of ``pmod(hash48_expr(term), n_buckets)`` — the
    probe computes buckets driver-side from the query literals."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:12],
               16) % n_buckets


def _tokens(text_col: str):
    # the repo-wide single-space token contract (text.py, bm25_scores)
    return F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
                    lambda x: x != "")


def postings_frame(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   n_buckets: int = 64) -> DataFrame:
    """The posting relation ``(term, doc_id, dl, tf, bucket)`` of a
    document batch — the single spelling shared by the batch build, the
    append path, and the streaming twin."""
    toks = _tokens(text_col)
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.size(toks).alias("dl"),
                        toks.alias("__t"))
            .select("doc_id", "dl", F.explode("__t").alias("term"))
            .groupBy("term", "doc_id", "dl")
            .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
            .withColumn("bucket",
                        F.pmod(hash48_expr("term"),
                               F.lit(n_buckets)).cast("int")))


def corpus_constants(docs: DataFrame,
                     text_col: str = "text") -> tuple[int, int]:
    """Exact ``(N, Σdl)`` of a batch.  Documents with zero tokens
    produce no postings but still count here — exactly like
    ``bm25_scores``'s global aggregate."""
    toks = _tokens(text_col)
    row = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum(F.size(toks)), F.lit(0)).cast("bigint")
         .alias("sum_dl")).collect()[0]
    return int(row["n_docs"]), int(row["sum_dl"])


def write_inverted_index(docs: DataFrame, path: str,
                         id_col: str = "doc_id", text_col: str = "text",
                         n_buckets: int = 64) -> dict:
    """Materialize the posting-list layout; returns the stats sidecar."""
    n_docs, sum_dl = corpus_constants(docs, text_col)
    postings_frame(docs, id_col, text_col, n_buckets) \
        .write.mode("overwrite").partitionBy("bucket").parquet(path)
    stats = {"n_docs": n_docs, "sum_dl": sum_dl,
             "n_buckets": int(n_buckets)}
    with open(os.path.join(path, _STATS_FILE), "w") as fh:
        json.dump(stats, fh)
    return stats


def read_index_stats(path: str) -> dict:
    with open(os.path.join(path, _STATS_FILE)) as fh:
        return json.load(fh)


def append_to_inverted_index(docs: DataFrame, path: str,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> dict:
    """Append a new batch's postings under the index's OWN bucketing
    and update the sidecar constants exactly (caller contract: batch
    ids are disjoint from indexed ids — same as dedup_against_index)."""
    stats = read_index_stats(path)
    n, s = corpus_constants(docs, text_col)
    postings_frame(docs, id_col, text_col, stats["n_buckets"]) \
        .write.mode("append").partitionBy("bucket").parquet(path)
    stats["n_docs"] += n
    stats["sum_dl"] += s
    with open(os.path.join(path, _STATS_FILE), "w") as fh:
        json.dump(stats, fh)
    return stats


def bm25_from_index(spark: SparkSession, path: str,
                    query_terms: list[str], k1: float = 1.2,
                    b: float = 0.75) -> DataFrame:
    """BM25 of every document that hits ≥ 1 query term, answered from
    the materialized index: ``(doc_id, n_terms_hit, score)`` —
    bit-identical to ``text.bm25_scores(...).where(n_terms_hit >= 1)``
    (identical IEEE expression nesting, fixed literal summation order;
    equivalence pytest-pinned).

    The scan reads only the probed buckets (PartitionFilters) with the
    term equality pushed down (PushedFilters) — at 100 TB the probe
    touches len(terms)/n_buckets of the files and the biggest exchange
    carries the hit sliver's integer rows."""
    stats = read_index_stats(path)
    terms = _dedupe_terms(query_terms)
    buckets = sorted({term_bucket(t, stats["n_buckets"]) for t in terms})
    posts = (spark.read.parquet(path)
             .where(F.col("bucket").isin(buckets)
                    & F.col("term").isin(terms)))
    return bm25_over_postings(posts, stats["n_docs"], stats["sum_dl"],
                              terms, k1=k1, b=b)


def _dedupe_terms(query_terms: list[str]) -> list[str]:
    terms: list[str] = []
    for t in query_terms:
        if t not in terms:
            terms.append(t)
    if not terms:
        raise ValueError("query_terms must be non-empty")
    return terms


def bm25_over_postings(posts: DataFrame, n_docs: int, sum_dl: int,
                       query_terms: list[str], k1: float = 1.2,
                       b: float = 0.75) -> DataFrame:
    """Score an already-pruned posting relation ``(term, doc_id, dl,
    tf)`` against exact corpus constants — the single scoring spelling
    shared by the parquet-layout probe and the streaming twin's live
    index (caller prunes; extra terms in ``posts`` are ignored)."""
    terms = _dedupe_terms(query_terms)
    posts = posts.where(F.col("term").isin(terms))
    # ONE pass over the pruned postings: pivot per-doc tf columns first
    # (each sum() aggregates at most one row — postings are unique per
    # (term, doc)), then per-term df is a tiny aggregate OVER the pivot
    # broadcast back with a crossJoin — the bm25_scores stage shape,
    # and the posting scan runs once instead of twice (df join removed)
    pivoted = posts.groupBy("doc_id", "dl").agg(
        *[F.coalesce(F.sum(F.when(F.col("term") == t, F.col("tf"))),
                     F.lit(0).cast("bigint")).alias(f"__tf_{i}")
          for i, t in enumerate(terms)])
    stats = pivoted.agg(
        *[F.sum(F.when(F.col(f"__tf_{i}") > 0, 1).otherwise(0))
          .cast("bigint").alias(f"__df_{i}")
          for i in range(len(terms))])
    joined = pivoted.crossJoin(F.broadcast(stats))

    # identical nesting as text.bm25_scores (avgdl as the same one
    # exact IEEE division of the exact integer constants)
    n = F.lit(float(n_docs))
    avgdl = F.lit(float(sum_dl)) / n
    denom_tail = F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * (F.col("dl").cast("double")
                                            / avgdl))

    def contrib(i: int):
        tf = F.col(f"__tf_{i}").cast("double")
        dfc = F.col(f"__df_{i}").cast("double")
        idf = F.log(F.lit(1.0) + (n - dfc + F.lit(0.5))
                    / (dfc + F.lit(0.5)))
        return idf * (tf * F.lit(k1 + 1.0)) / (tf + denom_tail)

    score = contrib(0)
    for i in range(1, len(terms)):
        score = score + contrib(i)          # fixed literal order
    hits = sum((F.col(f"__tf_{i}") > 0).cast("int")
               for i in range(len(terms)))
    return joined.select(
        "doc_id",
        hits.cast("int").alias("n_terms_hit"),
        score.alias("score"))
