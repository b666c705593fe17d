"""DSIR data selection (Xie, Santurkar, Ma, Liang: "Data Selection for
Language Models via Importance Resampling", NeurIPS 2023) — select raw
web documents whose hashed-n-gram distribution looks like a trusted
target corpus.  The third member of the repo's distribution-level quality
gates, next to the CCNet perplexity ranking (lm.py) and the trained
logistic quality classifier (classifier.py).

Shape (paper → Spark-first):

- **Features**: unigram + bigram counts hashed into ``n_buckets`` buckets
  (paper: 10k; default here 1024 so the oracle's pinned table stays
  readable).  Bucket = 48-bit md5 prefix mod B — the repo-wide
  cross-engine hash contract (sketches.hash48_expr), over the repo-wide
  single-space tokenization (text.token_array_expr).
- **Fit** (``fit_dsir``): bag-of-buckets counts for the target slice
  (``doc_id % target_mod == 0`` — the bounded curated-reference recipe
  lm.py and classifier.py use) and for the full raw corpus, each an
  exact-integer ``groupBy(bucket).count`` whose output is B rows —
  collected to the driver like any bounded training artifact.  The
  log-importance table ``lr_e6[b] = floor(1e6 · (ln p̂(b) − ln q̂(b)))``
  (add-one smoothing both sides) is built by ONE shared Python function
  (``lr_table_from_counts``) — the oracle builder replays the same exact
  integer counts through the same function, so the pinned table is
  bit-identical and no ``ln`` ever crosses an engine boundary.
- **Score** (``score_dsir``): map-only Arrow kernel — per document,
  ``score_e6 = Σ lr_e6[bucket(gram)]`` over gram OCCURRENCES (int64
  adds, order-free).  Each DISTINCT gram per batch is hashed once
  (dict cache — the round-3 unique-gram kernel lesson).  No shuffle; the
  corpus text never leaves its input partition.
- **Select** (``dsir_select``): the paper resamples with Gumbel noise;
  for engine determinism this implements the thresholded variant —
  ``selected = score_e6 ≥ cutoff_e6`` where the cutoff is a fixed
  quantile of the TARGET slice's own scores (bounded collect at fit
  time, a pinned constant at serve time — map-side CASE, never a global
  sort of the corpus).  Documented deviation: deterministic top-mass
  selection instead of stochastic resampling.

At 100 TB: two integer aggregates of B rows (fit), one broadcast table of
B ints, one map-only scoring pass.  Nothing data-sized shuffles.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from image_pdf_ocr_suite_spark.analytics.text import token_array_expr

SCALE = 1_000_000


def _tokens(text: object) -> list[str]:
    # kernel-side spelling of token_array_expr: split(" "), drop ""
    if not isinstance(text, str):
        return []
    return [t for t in text.split(" ") if t]


def _grams(toks: list[str]) -> list[str]:
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def bucket_of(gram: str, n_buckets: int) -> int:
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:12],
               16) % n_buckets


def gram_rows(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(gram) rows — unigrams + bigrams on the single-space contract,
    in ONE scan (the token array materializes first per the repo's
    HOF rule, then one explode of unigrams ++ bigrams — a separate
    unioned bigram projection would read the corpus twice)."""
    t = docs.select(token_array_expr(text_col).alias("__toks"))
    bigrams = F.when(
        F.size("__toks") >= 2,
        F.transform(F.sequence(F.lit(1), F.size("__toks") - 1),
                    lambda i: F.concat_ws(" ", F.slice("__toks", i, 2)))
    ).otherwise(F.array().cast("array<string>"))
    return t.select(
        F.explode(F.concat(F.col("__toks"), bigrams)).alias("gram"))


def bucket_counts(docs: DataFrame, n_buckets: int = 1024,
                  text_col: str = "text") -> dict[int, int]:
    """Exact hashed-bucket counts, collected (bounded: ≤ B rows)."""
    from image_pdf_ocr_suite_spark.analytics.sketches import hash48_expr

    g = gram_rows(docs, text_col)
    bucketed = g.select((hash48_expr("gram") % n_buckets).alias("bucket"))
    rows = bucketed.groupBy("bucket").count().collect()
    return {int(r["bucket"]): int(r["count"]) for r in rows}


def _bucket_counts_fused(docs: DataFrame, id_col: str, target_mod: int,
                         n_buckets: int, text_col: str
                         ) -> tuple[dict[int, int], dict[int, int]]:
    """(target_counts, raw_counts) in ONE corpus pass (round 6).

    The separate ``bucket_counts(target)`` + ``bucket_counts(docs)``
    fit walked the gram stream twice — and the Catalyst spelling both
    builds the bigram array through an interpreted ``transform`` lambda
    and md5-hashes every gram OCCURRENCE in the JVM.  This kernel
    tokenizes once, hashes each DISTINCT gram per batch once
    (factorize → md5 → gather, the round-3 Zipf rule), and bincounts
    occurrences into per-batch integer partials; the target slice is
    counted from the same occurrences via its ``id % target_mod`` flag.
    Counts are exact integers, so the result is identical to the
    two-pass spelling for any batching/partitioning."""
    import numpy as np
    import pandas as pd

    from image_pdf_ocr_suite_spark.partitioning import fan_out_small

    def kernel(batches):
        for pdf in batches:
            raw = np.zeros(n_buckets, dtype=np.int64)
            tgt = np.zeros(n_buckets, dtype=np.int64)
            flat: list[str] = []
            flags: list[bool] = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                grams = _grams(_tokens(t))
                if not grams:
                    continue
                flat.extend(grams)
                flags.extend(
                    [i is not None and int(i) % target_mod == 0]
                    * len(grams))
            if flat:
                codes, uniques = pd.factorize(
                    np.asarray(flat, dtype=object))
                ub = np.fromiter(
                    (bucket_of(u, n_buckets) for u in uniques),
                    dtype=np.int64, count=len(uniques))
                occ = ub[codes]
                raw += np.bincount(occ, minlength=n_buckets)
                is_t = np.asarray(flags, dtype=bool)
                if is_t.any():
                    tgt += np.bincount(occ[is_t], minlength=n_buckets)
            nz = np.flatnonzero(raw)
            yield pd.DataFrame({"bucket": nz.astype(np.int32),
                                "c_raw": raw[nz], "c_tgt": tgt[nz]})

    parts = fan_out_small(docs.select(id_col, text_col)).mapInPandas(
        kernel, schema="bucket int, c_raw bigint, c_tgt bigint")
    rows = (parts.groupBy("bucket")
            .agg(F.sum("c_raw").alias("cr"), F.sum("c_tgt").alias("ct"))
            .collect())
    cr = {int(r["bucket"]): int(r["cr"]) for r in rows}
    ct = {int(r["bucket"]): int(r["ct"]) for r in rows if int(r["ct"])}
    return ct, cr


def lr_table_from_counts(target: dict[int, int], raw: dict[int, int],
                         n_buckets: int) -> list[int]:
    """The shared (Spark fit == oracle replay) log-ratio table:
    ``floor(1e6 · (ln((ct+1)/(Ct+B)) − ln((cr+1)/(Cr+B))))`` per bucket —
    same CPython libm on both sides, hence bit-equal pinned integers."""
    ct_total = sum(target.values()) + n_buckets
    cr_total = sum(raw.values()) + n_buckets
    out = []
    for b in range(n_buckets):
        lp = math.log((target.get(b, 0) + 1) / ct_total)
        lq = math.log((raw.get(b, 0) + 1) / cr_total)
        out.append(int(math.floor((lp - lq) * SCALE)))
    return out


def replay_scores(texts: list, lr_e6: list[int],
                  n_buckets: int) -> list[int]:
    """Single-process scoring replay — the cutoff trainer and the test
    oracle for the Arrow kernel (identical arithmetic: int sums of the
    same pinned table)."""
    out = []
    for t in texts:
        s = 0
        for g in _grams(_tokens(t)):
            s += lr_e6[bucket_of(g, n_buckets)]
        out.append(s)
    return out


def cutoff_from_scores(scores: list[int], frac: float = 0.5) -> int:
    """Deterministic quantile pick: the ascending-sorted score at index
    ``floor((1-frac) · (n-1))`` — ``frac`` = fraction of the TARGET
    slice that would pass its own cutoff."""
    if not scores:
        raise ValueError("cutoff needs at least one target-slice score")
    s = sorted(scores)
    return int(s[int(math.floor((1.0 - frac) * (len(s) - 1)))])


@dataclass(frozen=True)
class DsirModel:
    lr_e6: tuple
    cutoff_e6: int
    n_buckets: int
    target_mod: int


def fit_dsir(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", target_mod: int = 7,
             n_buckets: int = 1024, frac: float = 0.5) -> DsirModel:
    """Fit the importance table + cutoff.  Target = the deterministic
    curated slice ``id % target_mod == 0``; raw = the full corpus.  Two
    bounded integer aggregates, then a DISTRIBUTED exact order
    statistic for the cutoff — the target slice is scored by the same
    Arrow kernel as ``score_dsir`` (integer sums of the shared pinned
    table, so the value is identical to the single-process
    ``cutoff_from_scores(replay_scores(...))``) and the k-th ascending
    (score, id) is picked via relational.globalrank — the slice's TEXT
    never reaches the driver (it is ~1/target_mod of the corpus; a
    collect here is the 100 TB driver-OOM anti-pattern)."""
    from image_pdf_ocr_suite_spark.relational.globalrank import global_rank

    target = docs.where(F.col(id_col) % target_mod == 0)
    # one fused corpus pass for BOTH count tables (round 6) — exact
    # integer counts, identical to the former per-slice bucket_counts
    ct, cr = _bucket_counts_fused(docs, id_col, target_mod, n_buckets,
                                  text_col)
    lr = lr_table_from_counts(ct, cr, n_buckets)
    scored = _scored(target, lr, n_buckets, text_col, id_col)
    ranked = global_rank(scored, ["score_e6", id_col])
    n = ranked.count()
    if n == 0:
        raise ValueError("cutoff needs at least one target-slice score")
    k = int(math.floor((1.0 - frac) * (n - 1)))
    cutoff = int(ranked.where(F.col("rk") == k)
                 .collect()[0]["score_e6"])
    return DsirModel(tuple(lr), cutoff, n_buckets, target_mod)


def _scored(docs: DataFrame, lr_e6, n_buckets: int, text_col: str,
            id_col: str) -> DataFrame:
    """(id, score_e6) via the one shared Arrow scoring kernel — used by
    both ``score_dsir`` and the fit-time cutoff statistic."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    lr = list(lr_e6)
    nb = n_buckets

    def _fn(s):
        cache: dict[str, int] = {}
        out = []
        for t in s:
            total = 0
            for g in _grams(_tokens(t)):
                v = cache.get(g)
                if v is None:
                    v = lr[bucket_of(g, nb)]
                    cache[g] = v
                total += v
            out.append(total)
        return pd.Series(out, dtype="int64")

    from image_pdf_ocr_suite_spark.partitioning import fan_out_small

    return fan_out_small(docs.select(id_col, text_col)).select(
        F.col(id_col),
        pandas_udf(_fn, "long")(F.col(text_col)).alias("score_e6"))


def score_dsir(docs: DataFrame, model: DsirModel, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Map-only Arrow scoring: ``(id, score_e6 bigint)`` for EVERY input
    document (null/empty text scores 0)."""
    return _scored(docs, model.lr_e6, model.n_buckets, text_col, id_col)


def dsir_select(docs: DataFrame, model: DsirModel | None = None,
                text_col: str = "text", id_col: str = "doc_id",
                target_mod: int = 7, n_buckets: int = 1024,
                frac: float = 0.5) -> DataFrame:
    """The full DSIR gate: ``(id, score_e6, selected)`` — selection is a
    map-side threshold against the fit-time cutoff constant."""
    if model is None:
        model = fit_dsir(docs, text_col, id_col, target_mod, n_buckets,
                         frac)
    scored = score_dsir(docs, model, text_col, id_col)
    return scored.select(
        id_col, "score_e6",
        (F.col("score_e6") >= model.cutoff_e6).alias("selected"))
