"""Unigram-LM tokenizer training (Kudo, ACL 2018 — the SentencePiece
unigram model), hard-EM form: the second classic subword trainer next
to BPE (analytics/bpe.py) in an LLM data pipeline.

Reference parity note: the reference repo has no tokenizer trainer —
this is part of the task-mandated training-data-pipeline surface
(tokenization family, alongside bpe.py / text.token_count).

Spark-first shape (mirrors bpe.py's vocabulary-relation trick):

- The corpus collapses ONCE to the (word, freq) vocabulary relation
  (``bpe.word_vocab`` — the only data-sized shuffle).  Seeding and
  every EM round run over the vocab relation only, so a 100-TB corpus
  is scanned once and never re-shuffled.
- Seeding: an Arrow kernel emits per-batch substring partial counts
  (every position, length 1..max_len, weighted by word freq); a
  combinable groupBy-sum counts them; singles (alphabet-sized) and the
  top ``seed_multi`` multi-char pieces (count DESC, piece ASC — a
  TakeOrdered) come back to the driver.  The shuffle carries piece
  partials, never words.
- Each of the bounded ``rounds`` (CLAUDE.md iterative budget) hard-EM
  rounds: broadcast the integer-quantized piece scores, Viterbi-segment
  every vocabulary word in an Arrow kernel (per-batch partial piece
  counts), groupBy-sum, collect the bounded (≤ singles + seed_multi
  rows) count table, and prune driver-side.  Per round the driver
  traffic is one vocab-table-sized row set — like BPE's one row per
  merge round, scaled to the sketch-sized piece table.
- Encoding is map-only: broadcast final scores, per-batch distinct-word
  memo of Viterbi token counts, one short-key aggregate per group.

Determinism contract (what makes the DuckDB oracle pin exact): all
counts are exact integers summed order-independently; piece scores are
integer-quantized log-probs ``floor(1e6·ln(count/total))`` computed by
the ONE shared ``_qlog`` on identical integers; Viterbi DP sums those
integers and breaks ties toward the longest last piece (smallest split
point wins at equal score); pruning sorts by (count DESC, piece ASC).
``replay_train`` / ``replay_encode_stats`` are the single-process
replays built from the SAME per-word helpers, so the distributed answer
equals the replay row for row and the driver oracle pins its literals
(the bpe.py / classifier.py oracle pattern).
"""

from __future__ import annotations

import math
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics.bpe import word_vocab

QLOG_SCALE = 1_000_000
# Fallback for a character outside the trained alphabet (cannot occur
# when encoding the training corpus itself; kept total so encode is
# defined on any input): one piece, strongly penalized.
UNK_QLOG = -100 * QLOG_SCALE

MAX_LEN = 6
SEED_MULTI = 384
TARGET_MULTI = 192
ROUNDS = 4


def _qlog(count: int, total: int) -> int:
    """floor(1e6·ln(count/total)) — the one shared quantizer; both the
    distributed path and the replay call it on identical integers."""
    return math.floor(QLOG_SCALE * math.log(count / total))


def _word_piece_counts(word: str, freq: int, max_len: int,
                       acc: dict[str, int]) -> None:
    """Every substring occurrence of length 1..max_len, freq-weighted —
    the unigram seed statistic."""
    n = len(word)
    for i in range(n):
        top = min(max_len, n - i)
        for ln in range(1, top + 1):
            p = word[i:i + ln]
            acc[p] = acc.get(p, 0) + freq


def _viterbi(word: str, scores: dict[str, int], max_len: int) -> list[str]:
    """Best segmentation under integer piece scores.  DP over split
    points; at equal score the SMALLEST split point wins (longest last
    piece) — a total, shared tie-break.  Single characters absent from
    ``scores`` fall back to UNK_QLOG so every word segments."""
    n = len(word)
    best_s = [0] * (n + 1)
    best_i = [0] * (n + 1)
    for j in range(1, n + 1):
        bs = None
        bi = 0
        for i in range(max(0, j - max_len), j):
            q = scores.get(word[i:j])
            if q is None:
                if j - i != 1:
                    continue
                q = UNK_QLOG
            s = best_s[i] + q
            if bs is None or s > bs:
                bs = s
                bi = i
        best_s[j] = bs if bs is not None else UNK_QLOG * j
        best_i[j] = bi
    out: list[str] = []
    j = n
    while j > 0:
        i = best_i[j]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def _seed_from_counts(singles: dict[str, int], multi_top: list[tuple[str, int]]
                      ) -> dict[str, int]:
    """Initial count table: the full alphabet + the kept multi pieces."""
    counts = dict(singles)
    counts.update(multi_top)
    return counts


def _top_multi(multi: dict[str, int], n_keep: int) -> list[tuple[str, int]]:
    """(count DESC, piece ASC) — Python code-point order equals Spark's
    binary UTF-8 order, the bpe.py tie-break identity."""
    return sorted(multi.items(), key=lambda kv: (-kv[1], kv[0]))[:n_keep]


def _em_next(new_counts: dict[str, int], singles: Iterable[str],
             rnd: int, rounds: int, target_multi: int) -> dict[str, int]:
    """Post-E-step pruning shared by both paths: singles survive with a
    floor count of 1 (coverage), multi pieces shrink 30% per round down
    to ``target_multi`` (exact on the final round)."""
    nxt = {p: new_counts.get(p, 1) for p in singles}
    multi = {p: c for p, c in new_counts.items() if len(p) > 1}
    if rnd == rounds - 1:
        n_keep = target_multi
    else:
        n_keep = max(target_multi, (len(multi) * 7) // 10)
    nxt.update(_top_multi(multi, n_keep))
    return nxt


def _finalize(counts: dict[str, int]) -> list[tuple[str, int, int]]:
    """[(piece, count, qlog)] ranked (count DESC, piece ASC).  An
    empty/all-null corpus yields an empty vocabulary (encode then
    falls back to UNK single-char pieces)."""
    if not counts:
        return []
    total = sum(counts.values())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(p, c, _qlog(c, total)) for p, c in ranked]


def _scores(counts: dict[str, int]) -> dict[str, int]:
    total = sum(counts.values())
    return {p: _qlog(c, total) for p, c in counts.items()}


# ---------------------------------------------------------------------------
# distributed training
# ---------------------------------------------------------------------------

def _piece_partials(vocab: DataFrame, kernel_fn) -> DataFrame:
    """groupBy-sum of per-batch (piece, c) partials from ``kernel_fn``
    (combinable — only piece partials ever shuffle)."""
    parts = vocab.mapInPandas(kernel_fn, schema="piece string, c bigint")
    return parts.groupBy("piece").agg(
        F.sum("c").cast("bigint").alias("c"))


def _seed_kernel(max_len: int):
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            acc: dict[str, int] = {}
            for w, f in zip(pdf["word"], pdf["freq"]):
                if isinstance(w, str) and w:
                    _word_piece_counts(w, int(f), max_len, acc)
            yield pd.DataFrame({"piece": list(acc.keys()),
                                "c": list(acc.values())})

    return kernel


def _estep_kernel(b_scores, max_len: int):
    import pandas as pd

    def kernel(batches):
        sc = b_scores.value
        for pdf in batches:
            acc: dict[str, int] = {}
            for w, f in zip(pdf["word"], pdf["freq"]):
                if not isinstance(w, str) or not w:
                    continue
                f = int(f)
                for p in _viterbi(w, sc, max_len):
                    acc[p] = acc.get(p, 0) + f
            yield pd.DataFrame({"piece": list(acc.keys()),
                                "c": list(acc.values())})

    return kernel


def unigram_train(docs: DataFrame, text_col: str = "text",
                  max_len: int = MAX_LEN, seed_multi: int = SEED_MULTI,
                  target_multi: int = TARGET_MULTI, rounds: int = ROUNDS,
                  driver_max_vocab: int | None = None
                  ) -> list[tuple[str, int, int]]:
    """Learn the unigram vocabulary; returns [(piece, count, qlog)] in
    rank order — equal to ``replay_train`` row for row.  Vocabularies ≤
    ``driver_max_vocab`` (default ``bpe.DRIVER_MAX_VOCAB``, counted
    first — the connected_components_auto pattern) run the bit-equal
    replay driver-side; pass ``0`` to force the distributed EM."""
    from image_pdf_ocr_suite_spark.analytics.bpe import DRIVER_MAX_VOCAB

    if driver_max_vocab is None:
        driver_max_vocab = DRIVER_MAX_VOCAB
    sc = docs.sparkSession.sparkContext
    vocab = word_vocab(docs, text_col).persist()
    try:
        cnt = vocab.count()
        if driver_max_vocab and cnt <= driver_max_vocab:
            wf = {r["word"]: int(r["freq"]) for r in vocab.collect()}
            return replay_train(wf, max_len=max_len,
                                seed_multi=seed_multi,
                                target_multi=target_multi, rounds=rounds)
        # persist: the two bounded collects below must not re-run the
        # substring enumeration (the heaviest pass) twice
        seed = _piece_partials(vocab, _seed_kernel(max_len)).persist()
        try:
            singles = {r["piece"]: int(r["c"])
                       for r in seed.where(F.length("piece") == 1).collect()}
            multi_top = [(r["piece"], int(r["c"]))
                         for r in seed.where(F.length("piece") > 1)
                                      .orderBy(F.desc("c"), F.asc("piece"))
                                      .limit(seed_multi).collect()]
        finally:
            seed.unpersist()
        counts = _seed_from_counts(singles, multi_top)
        for rnd in range(rounds):
            b = sc.broadcast(_scores(counts))
            new = {r["piece"]: int(r["c"])
                   for r in _piece_partials(
                       vocab, _estep_kernel(b, max_len)).collect()}
            counts = _em_next(new, singles, rnd, rounds, target_multi)
        return _finalize(counts)
    finally:
        vocab.unpersist()


def vocab_table(spark, trained: list[tuple[str, int, int]]) -> DataFrame:
    """The learned vocabulary as a relation:
    (rank, piece, piece_count, qlog)."""
    rows = [(i + 1, p, c, q) for i, (p, c, q) in enumerate(trained)]
    return spark.createDataFrame(
        rows, "rank int, piece string, piece_count bigint, qlog bigint")


def _vocab_max_len(trained: list[tuple[str, int, int]]) -> int:
    """Viterbi window for a trained vocab = its longest piece — derived
    from the artifact itself so an encode can never silently miss
    pieces trained with a different ``max_len``."""
    return max((len(p) for p, _c, _q in trained), default=1)


def encode_token_stats(docs: DataFrame, trained: list[tuple[str, int, int]],
                       text_col: str = "text", group_col: str = "lang",
                       max_len: int | None = None) -> DataFrame:
    """(group, n_docs, n_tokens_unigram): map-only Viterbi token counts
    under the broadcast final scores (per-batch distinct-word memo) +
    one short-key aggregate.  ``n_docs`` is independently SQL-checkable;
    ``n_tokens_unigram`` is the pinned training artifact.  ``max_len``
    defaults to the vocab's own longest piece."""
    import pandas as pd

    if max_len is None:
        max_len = _vocab_max_len(trained)
    scores = {p: q for p, _c, q in trained}
    b = docs.sparkSession.sparkContext.broadcast(scores)
    src = docs.select(group_col, text_col)

    def kernel(batches):
        sc = b.value
        memo: dict[str, int] = {}
        for pdf in batches:
            gs, ns = [], []
            for g, t in zip(pdf[group_col], pdf[text_col]):
                total = 0
                if isinstance(t, str):
                    for w in t.split(" "):
                        if not w:
                            continue
                        n = memo.get(w)
                        if n is None:
                            n = len(_viterbi(w, sc, max_len))
                            memo[w] = n
                        total += n
                gs.append(g)
                ns.append(total)
            yield pd.DataFrame({group_col: gs, "n": ns})

    per_doc = src.mapInPandas(kernel, schema=f"{group_col} string, n bigint")
    return per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("n_tokens_unigram"))


# ---------------------------------------------------------------------------
# deterministic single-process replay (oracle pinning + pytest reference)
# ---------------------------------------------------------------------------

def replay_train(word_freq: dict[str, int], max_len: int = MAX_LEN,
                 seed_multi: int = SEED_MULTI,
                 target_multi: int = TARGET_MULTI, rounds: int = ROUNDS
                 ) -> list[tuple[str, int, int]]:
    """Pure-Python replay — same helpers, same integer sums, same
    tie-breaks, so it equals ``unigram_train`` row for row."""
    acc: dict[str, int] = {}
    for w, f in word_freq.items():
        if w:
            _word_piece_counts(w, f, max_len, acc)
    singles = {p: c for p, c in acc.items() if len(p) == 1}
    multi = {p: c for p, c in acc.items() if len(p) > 1}
    counts = _seed_from_counts(singles, _top_multi(multi, seed_multi))
    for rnd in range(rounds):
        scores = _scores(counts)
        new: dict[str, int] = {}
        for w, f in word_freq.items():
            if not w:
                continue
            for p in _viterbi(w, scores, max_len):
                new[p] = new.get(p, 0) + f
        counts = _em_next(new, singles, rnd, rounds, target_multi)
    return _finalize(counts)


def replay_encode_stats(rows: list[tuple[str | None, str | None]],
                        trained: list[tuple[str, int, int]],
                        max_len: int | None = None
                        ) -> dict[str | None, tuple[int, int]]:
    """{group: (n_docs, n_tokens_unigram)} — mirror of
    ``encode_token_stats``."""
    if max_len is None:
        max_len = _vocab_max_len(trained)
    scores = {p: q for p, _c, q in trained}
    memo: dict[str, int] = {}
    out: dict[str | None, list[int]] = {}
    for g, t in rows:
        acc = out.setdefault(g, [0, 0])
        acc[0] += 1
        if isinstance(t, str):
            for w in t.split(" "):
                if not w:
                    continue
                n = memo.get(w)
                if n is None:
                    n = len(_viterbi(w, scores, max_len))
                    memo[w] = n
                acc[1] += n
    return {g: (a, b) for g, (a, b) in out.items()}
