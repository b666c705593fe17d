"""Byte-pair-encoding merge training (Sennrich et al., ACL 2016).

The tokenizer-training step of an LLM data pipeline: learn the top-N
BPE merges from corpus word frequencies, then measure the encoded token
stream.  Spark-first shape:

- The corpus collapses ONCE to a word-frequency vocabulary
  (``word_vocab``: explode + groupBy-count, the only data-sized
  shuffle).  All training iterations run over the vocabulary relation —
  the classic Sennrich efficiency trick, and the property that makes
  this scale: a 100-TB corpus has a bounded-ish distinct-word table
  that stays distributed, while the token stream is never re-scanned.
- Each of the ``n_merges`` rounds: an Arrow kernel re-segments every
  vocabulary word under the merges learned so far and emits adjacent
  symbol pairs weighted by word frequency; a combinable groupBy-sum
  counts them (map-side partials over the vocab relation only) and
  ``orderBy(...).limit(1)`` picks the winner as a TakeOrdered — no full
  sort, one driver row per round.  Rounds are bounded (default 8,
  CLAUDE.md iterative-algorithm budget).
- Tie-break is total: pair count DESC, then (left, right) ASC — Spark's
  binary UTF-8 ordering equals Python code-point ordering, so the
  pure-Python replay (``replay_merges``) is exactly the distributed
  answer and the driver oracle pins its integer rows as literals.

Words are segmented as ``list(word) + ["</w>"]`` (the end-of-word
marker is its own symbol, per the paper), and merges apply greedily
left-to-right in rank order — ``_apply_merges`` is the single shared
segmenter for training, encoding, and the replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics.text import token_array_expr

EOW = "</w>"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the single-space token contract — the one
    corpus-sized aggregation; everything downstream is vocab-sized."""
    from image_pdf_ocr_suite_spark.partitioning import fan_out_small

    return (fan_out_small(docs.select(F.col(text_col)))
                .select(F.explode(token_array_expr(text_col)).alias("word"))
                .groupBy("word")
                .agg(F.count(F.lit(1)).alias("freq")))


def _apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Greedy left-to-right application of merges in rank order."""
    sym: list[str] = list(word) + [EOW]
    for left, right in merges:
        if len(sym) < 2:
            break
        out: list[str] = []
        i = 0
        n = len(sym)
        while i < n:
            if i < n - 1 and sym[i] == left and sym[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def _pair_counts_df(vocab: DataFrame,
                    merges: list[tuple[str, str]]) -> DataFrame:
    """Adjacent-pair counts of the vocab under ``merges`` (Arrow kernel
    emits per-word pairs; Catalyst sums them — combinable)."""
    import pandas as pd

    b_merges = vocab.sparkSession.sparkContext.broadcast(list(merges))

    def kernel(batches):
        ms = b_merges.value
        for pdf in batches:
            lefts, rights, cs = [], [], []
            for w, f in zip(pdf["word"], pdf["freq"]):
                if not isinstance(w, str) or not w:
                    continue
                sym = _apply_merges(w, ms)
                f = int(f)
                for a, b in zip(sym, sym[1:]):
                    lefts.append(a)
                    rights.append(b)
                    cs.append(f)
            yield pd.DataFrame({"left": lefts, "right": rights, "c": cs})

    pairs = vocab.mapInPandas(
        kernel, schema="left string, right string, c bigint")
    return pairs.groupBy("left", "right") \
                .agg(F.sum("c").cast("bigint").alias("pair_count"))


# Bounded-vocabulary driver fast path (round 6): the merge rounds operate
# on the word-frequency RELATION, whose cardinality is the corpus
# vocabulary — counted before anything is collected, exactly the
# connected_components_auto pattern (dedup.py).  Below the budget the
# pure-Python replay (pinned row-for-row equal to the distributed
# spelling by the test suite) runs on the driver, replacing ~2-4 Spark
# jobs per merge round of pure scheduler latency; above it the
# distributed rounds run unchanged.
DRIVER_MAX_VOCAB = 200_000


def bpe_train(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text",
              driver_max_vocab: int = DRIVER_MAX_VOCAB
              ) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` merges; returns [(left, right, pair_count)] in
    rank order.  One corpus shuffle (word_vocab) + per-round vocab-sized
    pair aggregations; the driver sees one row per round.  Vocabularies
    ≤ ``driver_max_vocab`` (counted first) run the bit-equal replay
    driver-side; pass ``0`` to force the distributed rounds."""
    vocab = word_vocab(docs, text_col).persist()
    try:
        cnt = vocab.count()  # materialize once; rounds reuse the cache
        if driver_max_vocab and cnt <= driver_max_vocab:
            wf = {r["word"]: int(r["freq"]) for r in vocab.collect()}
            return replay_merges(wf, n_merges=n_merges)
        merges: list[tuple[str, str]] = []
        out: list[tuple[str, str, int]] = []
        for _ in range(n_merges):
            top = (_pair_counts_df(vocab, merges)
                   .orderBy(F.desc("pair_count"), F.asc("left"),
                            F.asc("right"))
                   .limit(1).collect())
            if not top:
                break
            left, right, c = top[0]["left"], top[0]["right"], \
                int(top[0]["pair_count"])
            merges.append((left, right))
            out.append((left, right, c))
        return out
    finally:
        vocab.unpersist()


def merge_table(spark, trained: list[tuple[str, str, int]]) -> DataFrame:
    """The learned merges as a relation: (rank, left, right, pair_count)."""
    rows = [(i + 1, left, right, c)
            for i, (left, right, c) in enumerate(trained)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, pair_count bigint")


def encode_token_stats(docs: DataFrame, merges: list[tuple[str, str]],
                       text_col: str = "text",
                       group_col: str = "lang") -> DataFrame:
    """Encoded-stream size per group: (group, n_docs, n_tokens_bpe).

    Map-only Arrow kernel (per-doc BPE symbol count under the broadcast
    merge list) + one short-key aggregate; ``n_docs`` is independently
    SQL-checkable, ``n_tokens_bpe`` is the pinned training artifact."""
    import pandas as pd

    b_merges = docs.sparkSession.sparkContext.broadcast(list(merges))
    src = docs.select(group_col, text_col)

    def kernel(batches):
        ms = b_merges.value
        cache: dict[str, int] = {}
        for pdf in batches:
            gs, ns = [], []
            for g, t in zip(pdf[group_col], pdf[text_col]):
                total = 0
                if isinstance(t, str):
                    for w in t.split(" "):
                        if not w:
                            continue
                        n = cache.get(w)
                        if n is None:
                            n = len(_apply_merges(w, ms))
                            cache[w] = n
                        total += n
                gs.append(g)
                ns.append(total)
            yield pd.DataFrame({group_col: gs, "n": ns})

    per_doc = src.mapInPandas(kernel, schema=f"{group_col} string, n bigint")
    return per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("n_tokens_bpe"))


# ---------------------------------------------------------------------------
# deterministic single-process replay (oracle pinning + pytest reference)
# ---------------------------------------------------------------------------

def replay_merges(word_freq: dict[str, int], n_merges: int = 8
                  ) -> list[tuple[str, str, int]]:
    """Pure-Python replay over a word-frequency dict — exact integer
    counts and the identical (count DESC, pair ASC) tie-break, so the
    result equals ``bpe_train`` row for row."""
    merges: list[tuple[str, str]] = []
    out: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freq.items():
            if not w:
                continue
            sym = _apply_merges(w, merges)
            for p in zip(sym, sym[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right))
        out.append((left, right, c))
    return out


def replay_word_freq(rows: list[str | None]) -> dict[str, int]:
    """Word frequencies from raw texts under the token contract."""
    wf: dict[str, int] = {}
    for t in rows:
        if not isinstance(t, str):
            continue
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    return wf


def replay_encode_stats(rows: list[tuple[str | None, str | None]],
                        merges: list[tuple[str, str]]
                        ) -> dict[str | None, tuple[int, int]]:
    """{group: (n_docs, n_tokens_bpe)} — mirror of encode_token_stats."""
    out: dict[str | None, list[int]] = {}
    for g, t in rows:
        acc = out.setdefault(g, [0, 0])
        acc[0] += 1
        if isinstance(t, str):
            acc[1] += sum(len(_apply_merges(w, merges))
                          for w in t.split(" ") if w)
    return {g: (a, b) for g, (a, b) in out.items()}
