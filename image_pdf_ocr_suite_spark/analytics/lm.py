"""CCNet-style n-gram LM quality scoring (Wenzek et al., LREC 2020).

CCNet ranks Common-Crawl documents by the perplexity of a small language
model trained on a trusted reference corpus, then cuts the ranking into
head / middle / tail quality buckets with FIXED cutoffs learned once on
held-out reference text.  This module reproduces that shape Spark-first:

- ``train_bigram_lm``: exact integer unigram/bigram counts over a
  deterministic reference slice (``doc_id % ref_mod == 0``), aggregated
  distributedly (one gram-keyed shuffle) and collected into a bounded
  driver artifact.  The LM is bounded by the REFERENCE corpus choice —
  never by the scored corpus — which is what makes the broadcast legal
  at 10^12-document scale (CCNet's reference is Wikipedia; the model
  ships to executors once, like the Tesseract traineddata artifact).
- ``score_perplexity``: map-only Arrow kernel over the full corpus.  Per
  document, add-one-smoothed bigram log-probability
  ``ln((c(w1,w2)+1) / (c(w1)+V))`` summed LEFT-TO-RIGHT in document
  order, divided once by the bigram count; quantized to
  ``floor(mean * 1e6)`` so the driver's hash gate compares integers.
  No shuffle at all — the scored text never leaves its input partition.
- ``train_bucket_cutoffs``: head/middle/tail tercile cutoffs of the
  reference slice's own scores (bounded collect, pinned constants at
  serving time — bucket assignment is a map-side CASE, never a global
  sort of the 100-TB corpus).

Tokenization is the repo-wide single-space contract
(``text.token_array_expr``): ``split(" ")`` with empties dropped, so the
bigram universe is exactly SQL-replicable (the oracle independently
recomputes ``n_bigrams`` from the parquet in DuckDB; only the float log
sum is pinned from the deterministic replay, `replay_scores`, which uses
the identical count dictionaries and the identical left-to-right float
loop — same CPython/libm on driver and workers, hence bit-equal).

Reference shape: CCNet (facebookresearch/cc_net) trains KenLM 5-gram
models per language and buckets at fixed perplexity percentiles; the
bigram + add-one form here keeps every count SQL-checkable while
preserving the pipeline shape (bounded reference LM -> broadcast ->
map-only scoring -> constant-cutoff bucketing).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics.text import token_array_expr

SCALE = 1_000_000


@dataclass(frozen=True)
class BigramLM:
    """Bounded reference-corpus LM: exact integer counts.

    ``v`` is the smoothing vocabulary size — distinct reference unigrams
    plus one OOV slot — fixed at train time.
    """

    unigram: dict[str, int]
    bigram: dict[tuple[str, str], int]
    v: int


def _tokens(text: object) -> list[str]:
    # the kernel-side spelling of token_array_expr: split(" "), drop ""
    if not isinstance(text, str):
        return []
    return [t for t in text.split(" ") if t]


def train_bigram_lm(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", ref_mod: int = 5) -> BigramLM:
    """Exact unigram/bigram counts over the ``id % ref_mod == 0`` slice.

    Distributed: explode grams, one groupBy-count shuffle (map-side
    partial combine), collect the BOUNDED result.  The bound is the
    reference-corpus vocabulary, a training-time constant independent of
    the corpus being scored.
    """
    from image_pdf_ocr_suite_spark.partitioning import fan_out_small

    ref = fan_out_small(
        docs.where((F.col(id_col) % ref_mod) == 0).select(text_col))
    toks = ref.select(token_array_expr(text_col).alias("__toks"))
    uni = (toks.select(F.explode("__toks").alias("w"))
               .groupBy("w").agg(F.count(F.lit(1)).alias("c"))).collect()
    big = (toks.where(F.size("__toks") >= 2)
               .select(F.explode(F.arrays_zip(
                   F.slice("__toks", 1, F.size("__toks") - 1).alias("w1"),
                   F.slice("__toks", 2, F.size("__toks") - 1).alias("w2"),
               )).alias("p"))
               .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
               .agg(F.count(F.lit(1)).alias("c"))).collect()
    unigram = {r["w"]: r["c"] for r in uni}
    bigram = {(r["w1"], r["w2"]): r["c"] for r in big}
    return BigramLM(unigram=unigram, bigram=bigram, v=len(unigram) + 1)


def _score_tokens(toks: list[str], uni: dict[str, int],
                  bi: dict[tuple[str, str], int], v: int) -> tuple[int, int]:
    """(n_bigrams, floor(mean_logprob * SCALE)) — the ONE float code path,
    shared verbatim by the Spark kernel and the driver-side replay so the
    doubles are bit-identical (same values, same left-to-right order)."""
    n = len(toks) - 1
    if n <= 0:
        return 0, 0
    s = 0.0
    for i in range(n):
        cb = bi.get((toks[i], toks[i + 1]), 0)
        cu = uni.get(toks[i], 0)
        s += math.log((cb + 1) / (cu + v))
    return n, math.floor((s / n) * SCALE)


def score_perplexity(docs: DataFrame, model: BigramLM,
                     cutoffs: tuple[int, int] | None = None,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Map-only LM scoring: ``(id, n_bigrams, logprob_q, bucket)``.

    ``bucket`` uses the CCNet convention — ``head`` is the highest
    mean log-probability (lowest perplexity) tercile, ``short`` marks
    documents with no bigram.  ``cutoffs=(c_head, c_mid)`` are the fixed
    trained constants; ``None`` buckets everything ``unbucketed`` (score
    only).  The model rides one broadcast; text never shuffles.
    """
    import pandas as pd

    spark = docs.sparkSession
    b_model = spark.sparkContext.broadcast(
        (model.unigram, model.bigram, model.v))
    c_head, c_mid = cutoffs if cutoffs is not None else (None, None)
    from image_pdf_ocr_suite_spark.partitioning import fan_out_small

    id_type = docs.schema[id_col].dataType.simpleString()
    src = fan_out_small(docs.select(id_col, text_col))

    def kernel(batches):
        uni, bi, v = b_model.value
        for pdf in batches:
            ids, nbs, qs, buckets = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                n, q = _score_tokens(_tokens(t), uni, bi, v)
                ids.append(i)
                nbs.append(n)
                qs.append(q)
                if n == 0:
                    buckets.append("short")
                elif c_head is None:
                    buckets.append("unbucketed")
                elif q >= c_head:
                    buckets.append("head")
                elif q >= c_mid:
                    buckets.append("middle")
                else:
                    buckets.append("tail")
            yield pd.DataFrame({id_col: ids, "n_bigrams": nbs,
                                "logprob_q": qs, "bucket": buckets})

    return src.mapInPandas(
        kernel,
        schema=(f"{id_col} {id_type}, n_bigrams bigint, "
                f"logprob_q bigint, bucket string"))


def tercile_cutoffs(scores: list[int]) -> tuple[int, int]:
    """(c_head, c_mid) from reference-slice scores: descending terciles,
    ``head`` = q >= c_head, ``middle`` = q >= c_mid.  Deterministic:
    pure integer indexing on the sorted list."""
    qs = sorted(scores, reverse=True)
    n = len(qs)
    if n == 0:
        return 0, 0
    i_head = max(0, -(-n // 3) - 1)          # ceil(n/3)-th value (1-based)
    i_mid = max(0, -(-(2 * n) // 3) - 1)
    return qs[i_head], qs[i_mid]


def train_bucket_cutoffs(docs: DataFrame, model: BigramLM,
                         text_col: str = "text", id_col: str = "doc_id",
                         ref_mod: int = 5) -> tuple[int, int]:
    """Tercile cutoffs over the reference slice's own scores (CCNet
    trains its percentile cutoffs on held-out reference text).  Bounded
    collect — one integer per reference document."""
    ref = docs.where((F.col(id_col) % ref_mod) == 0)
    scored = score_perplexity(ref, model, None, text_col, id_col)
    rows = scored.where(F.col("n_bigrams") > 0) \
                 .select("logprob_q").collect()
    return tercile_cutoffs([r[0] for r in rows])


# ---------------------------------------------------------------------------
# deterministic single-process replay (oracle pinning + pytest reference)
# ---------------------------------------------------------------------------

def replay_scores(rows: list[tuple[object, str]], ref_mod: int = 5
                  ) -> tuple[dict[object, tuple[int, int]],
                             tuple[int, int]]:
    """Pure-Python replay over ``(id, text)`` rows: trains the same
    counts on the ``id % ref_mod == 0`` slice, scores every row with the
    SAME ``_score_tokens`` float loop, and returns
    ``({id: (n_bigrams, logprob_q)}, (c_head, c_mid))``.

    Counts are exact integers (dict arithmetic == Spark's groupBy), and
    the float path is literally the same function the kernel calls, so
    the replay is bit-identical to the distributed run — the IVF
    "retrain driver-side and pin literals" oracle pattern, extended to
    per-document outputs.
    """
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for i, t in rows:
        if i is None or int(i) % ref_mod != 0:
            continue
        toks = _tokens(t)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni) + 1
    out: dict[object, tuple[int, int]] = {}
    ref_qs: list[int] = []
    for i, t in rows:
        n, q = _score_tokens(_tokens(t), uni, bi, v)
        out[i] = (n, q)
        if i is not None and int(i) % ref_mod == 0 and n > 0:
            ref_qs.append(q)
    return out, tercile_cutoffs(ref_qs)
