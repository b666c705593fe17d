"""Sentence segmentation with character-span offsets.

Training-data pipelines chunk, dedup, and attribute at sentence
granularity (sentence-level dedup, citation spans, chunk boundaries
that respect sentence edges).  This module segments each document into
sentences under the corpus token contract (single-space ``split(" ")``
— the exact contract every other text operator here pins) and emits
one row per sentence carrying ``[start, end)`` character offsets into
the ORIGINAL text, so downstream consumers can cut, highlight, or
re-assemble without re-tokenizing.

Semantics (deliberately closed-form so a SQL engine can replay them
exactly — no regex, no locale tables):

* tokens = ``text.split(" ")`` with empty tokens KEPT for offset
  arithmetic (token *i* starts at ``sum(len(t_j) + 1 for j < i)``);
* a token is *terminal* when it is non-empty and its last character is
  one of ``. ! ?``;
* sentence *k* = all tokens after the (k-1)-th terminal up to and
  including the k-th; trailing tokens after the last terminal form a
  final sentence when any of them is non-empty;
* a sentence's ``start`` is its first non-empty token's offset, its
  ``end`` is its last non-empty token's offset plus length, and
  ``sentence = text[start:end]`` (pytest-pinned invariant) — interior
  runs of spaces are preserved, surrounding ones are not.

Scale: one map-only Arrow kernel over the column-pruned ``(id, text)``
scan — no shuffle at any corpus size; per-document work is linear in
the token count (numpy cumsum for offsets).  Reference anchor: the
reference suite splits OCR text into lines for span emission
(/root/reference/image_pdf_ocr/ocr.py:392-420); this is the same
span-offset discipline applied at sentence granularity for corpus
prep.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_TERMINALS = (".", "!", "?")


def split_sentences(text: str) -> list[tuple[int, int, int, int]]:
    """``[(sent_idx, start, end, n_tokens), ...]`` for one document.

    Pure-Python single spelling shared by the Spark kernel, the pytest
    reference, and any driver-side consumer; ``n_tokens`` counts
    non-empty tokens.  Empty/whitespace-only text yields no rows.
    """
    ks, ss, es, cs = _split_arrays(text)
    return [(int(k), int(s), int(e), int(c))
            for k, s, e, c in zip(ks, ss, es, cs)]


def _split_arrays(text: str):
    """Vectorized core of :func:`split_sentences`: ``(sent_idx, start,
    end, n_tokens)`` parallel int64 arrays for one document.

    Round 6: sentence ids are a cumsum, so the non-empty tokens of one
    sentence form a CONTIGUOUS run — run-boundary detection replaces the
    former per-sentence boolean mask scan (O(sentences × tokens)).
    Within a run, token starts strictly increase and ``start+len`` is
    monotone, so the run's first/last elements ARE the old min/max —
    identical outputs by construction (pinned by the hypothesis
    properties and the DuckDB replay in test_sentences)."""
    toks = text.split(" ")
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                       count=len(toks))
    starts = np.zeros(len(toks), dtype=np.int64)
    if len(toks) > 1:
        np.cumsum(lens[:-1] + 1, out=starts[1:])
    term = np.fromiter(
        (t[-1] in _TERMINALS if t else False for t in toks),
        dtype=bool, count=len(toks))
    # sentence id of token i = number of terminals strictly before i,
    # so a terminal token closes its own sentence.
    sid = np.cumsum(term) - term
    ne = np.flatnonzero(lens > 0)
    if not len(ne):
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z
    sv = sid[ne]
    cut = np.flatnonzero(np.diff(sv))
    run_start = np.concatenate(([0], cut + 1))
    run_end = np.concatenate((cut, [len(ne) - 1]))
    first, last = ne[run_start], ne[run_end]
    return (sv[run_start].astype(np.int64), starts[first],
            starts[last] + lens[last],
            (run_end - run_start + 1).astype(np.int64))


def sentence_spans(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   include_text: bool = True) -> DataFrame:
    """``(id, sent_idx, start, end, n_tokens[, sentence])`` — one row
    per sentence, offsets into the original text, ``sentence`` the
    exact ``text[start:end]`` substring.  Map-only Arrow kernel; the
    scan is column-pruned to ``(id, text)`` and nothing shuffles.

    ``include_text=False`` drops the ``sentence`` column — the scale
    form: the substring is derivable from ``(id, start, end)`` against
    the source table, and shipping a full copy of the corpus back
    across the Arrow boundary roughly doubles the kernel's memory
    traffic (measured: the text-carrying form is JVM-ingest-bound and
    pairs at ~0.5 N→4N in the shared local JVM, while the offsets-only
    form carries 5 ints/sentence).  Downstream sentence-level dedup /
    chunk-boundary consumers only need the offsets.
    """
    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            reps: list[int] = []
            idx_a: list[np.ndarray] = []
            st_a: list[np.ndarray] = []
            en_a: list[np.ndarray] = []
            nt_a: list[np.ndarray] = []
            sent: list[str] = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(t, str) or not t:
                    continue
                ks, ss, es, cs = _split_arrays(t)
                if not len(ks):
                    continue
                ids.append(i)
                reps.append(len(ks))
                idx_a.append(ks)
                st_a.append(ss)
                en_a.append(es)
                nt_a.append(cs)
                if include_text:
                    sent.extend(t[s:e] for s, e in zip(ss, es))
            if reps:
                id_np = np.repeat(np.asarray(ids, dtype=object), reps)
                cols = {
                    id_col: pd.array(id_np, dtype="Int64"),
                    "sent_idx": pd.array(np.concatenate(idx_a),
                                         dtype="Int64"),
                    "start": pd.array(np.concatenate(st_a), dtype="Int64"),
                    "end": pd.array(np.concatenate(en_a), dtype="Int64"),
                    "n_tokens": pd.array(np.concatenate(nt_a),
                                         dtype="Int64"),
                }
            else:
                cols = {
                    id_col: pd.array([], dtype="Int64"),
                    "sent_idx": pd.array([], dtype="Int64"),
                    "start": pd.array([], dtype="Int64"),
                    "end": pd.array([], dtype="Int64"),
                    "n_tokens": pd.array([], dtype="Int64"),
                }
            if include_text:
                cols["sentence"] = pd.array(sent, dtype="string")
            yield pd.DataFrame(cols)

    schema = (f"{id_col} {id_type}, sent_idx bigint, start bigint, "
              "end bigint, n_tokens bigint")
    if include_text:
        schema += ", sentence string"
    from image_pdf_ocr_suite_spark.partitioning import fan_out_small

    return fan_out_small(df.select(id_col, text_col)).mapInPandas(
        kernel, schema=schema)


def sentence_stats(spans: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document sentence statistics over ``sentence_spans`` output:
    ``(id, n_sentences, mean_tokens_bp, max_tokens)`` with the mean in
    integer basis points (``floor(10000 * total / n)``) so the driver
    hash-checks exactly.  One short-key aggregate."""
    from pyspark.sql import functions as F

    return spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sentences"),
        F.floor(F.lit(10000) * F.sum("n_tokens") / F.count(F.lit(1)))
         .cast("bigint").alias("mean_tokens_bp"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"))
