"""Trained language-ID classifier (the fastText / CCNet lang-filter op).

CCNet (Wenzek et al. 2020) and every Common-Crawl pipeline since gate
documents through a trained fastText language identifier (Joulin et al.
2017) before LM scoring — a linear classifier over hashed character
n-gram features, trained OFFLINE on a bounded curated labeled set and
shipped to the cluster as an artifact.  This module reproduces exactly
that split Spark-first:

- Features: hashed character trigrams (md5 of the gram mod ``dim``,
  stable cross-run/cross-engine), counts L2-normalized over the
  feature block (tf/n features make the bias gradient dwarf the
  feature gradients and the model degenerates to class priors —
  measured), plus a constant bias slot.
- Training (``train_langid``): multiclass softmax regression by
  full-batch gradient descent over the labeled ``id % ref_mod == 0``
  slice, which is COLLECTED to the driver — legal at any corpus scale
  because the curated labeled set is bounded by construction (CCNet's
  is Wikipedia; the collect is the same bounded-sample device as the
  IVF quantizer's, similarity.py).  Softmax needs ~200 full-batch
  steps to separate 5 languages (5–8 steps plateau below the majority
  class — measured), which is why the distributed per-epoch trainer
  pattern (classifier.py, one Spark job per step) is wrong for THIS
  op: 200 Spark rounds violate the CLAUDE.md iterative-round budget,
  while 200 driver-side matmuls over a bounded slice are milliseconds.
  The distributed integer-quantized trainer remains demonstrated by
  analytics/classifier.py; this op demonstrates the offline-train /
  broadcast-score split real lang-ID pipelines use.
- Scoring (``score_langid``): map-only Arrow kernel — broadcast
  weights, per-document argmax class plus ``floor(1e6·p_argmax)``;
  ``correct`` is an integer column so label accuracy itself is
  hash-checked by the driver oracle.  Scoring never shuffles; the
  10^12-document corpus only ever sees the broadcast (C×(dim+1))
  float64 weight matrix.

Determinism: training runs single-process on the driver (no
distributed float summation at all); scoring float math is per-row
with a single spelling shared by kernel and replay, so pinned scores
are bit-exact.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 1024
NGRAM = 3
EPOCHS = 200
LR = 4.0
SCORE_SCALE = 1_000_000


def _np():
    import numpy as np
    return np


def _gram_slot(gram: str, dim: int = DIM) -> int:
    """Stable hashed slot: md5 low 8 bytes mod dim (the classifier.py
    convention)."""
    d = hashlib.md5(gram.encode("utf-8")).digest()
    return int.from_bytes(d[8:], "big") % dim


def _doc_vector(text: object, dim: int, memo: dict):
    """Dense float64 char-trigram vector: gram counts per hashed slot,
    L2-normalized over the feature block, plus bias 1.0 at slot
    ``dim``.  ``memo`` caches gram→slot across the batch.  Single
    shared spelling for trainer, kernel, and replay."""
    np = _np()
    x = np.zeros(dim + 1, dtype=np.float64)
    x[dim] = 1.0
    if isinstance(text, str) and len(text) >= NGRAM:
        n = len(text) - (NGRAM - 1)
        for i in range(n):
            g = text[i:i + NGRAM]
            slot = memo.get(g)
            if slot is None:
                slot = _gram_slot(g, dim)
                memo[g] = slot
            x[slot] += 1.0
        norm = float(np.sqrt(np.dot(x[:dim], x[:dim])))
        if norm > 0.0:
            x[:dim] /= norm
    return x


def _softmax_vec(z):
    """Shift-by-max softmax for one logit vector — identical op order
    kernel/replay."""
    np = _np()
    e = np.exp(z - float(np.max(z)))
    return e / float(np.sum(e))


def replay_train(rows: list[tuple[str, str]], dim: int = DIM,
                 epochs: int = EPOCHS, lr: float = LR):
    """Train softmax regression over (text, label) rows — the bounded
    curated slice.  Returns (classes, W) with W a (C, dim+1) float64
    matrix.  Vectorized full-batch GD: the feature matrix is built
    once (per-doc loop, shared ``_doc_vector`` spelling), then each
    epoch is two matmuls — 200 epochs over a few thousand labeled
    documents are milliseconds."""
    np = _np()
    classes = sorted({y for _t, y in rows if y is not None})
    if not classes:
        raise ValueError("no labeled training rows")
    cls_idx = {c: j for j, c in enumerate(classes)}
    n_cls, n_docs = len(classes), len(rows)
    memo: dict = {}
    x_mat = np.empty((n_docs, dim + 1), dtype=np.float64)
    y_hot = np.zeros((n_docs, n_cls), dtype=np.float64)
    for r, (t, y) in enumerate(rows):
        x_mat[r] = _doc_vector(t, dim, memo)
        y_hot[r, cls_idx[y]] = 1.0
    w = np.zeros((n_cls, dim + 1), dtype=np.float64)
    for _ in range(epochs):
        z = x_mat @ w.T                       # (n, C)
        z -= z.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        grad = (p - y_hot).T @ x_mat          # (C, dim+1)
        w -= (lr / n_docs) * grad
    return classes, w


def train_langid(docs: DataFrame, text_col: str = "text",
                 label_col: str = "lang", id_col: str = "doc_id",
                 ref_mod: int = 5, dim: int = DIM, epochs: int = EPOCHS,
                 lr: float = LR):
    """Collect the bounded labeled slice (curated by construction —
    the ``id % ref_mod == 0`` convention the CCNet-style LM and the
    quality classifier share) and train driver-side.  Returns
    (classes, W) ready for ``score_langid``."""
    rows = (docs.where((F.col(id_col) % ref_mod == 0)
                       & F.col(label_col).isNotNull())
                .select(id_col, text_col, label_col)
                .orderBy(id_col).collect())
    return replay_train([(r[text_col], r[label_col]) for r in rows],
                        dim=dim, epochs=epochs, lr=lr)


def score_langid(docs: DataFrame, classes: list[str], w,
                 text_col: str = "text", label_col: str = "lang",
                 id_col: str = "doc_id", dim: int = DIM) -> DataFrame:
    """Map-only scoring: (id, true_lang, pred_lang, score_q, correct).

    ``score_q = floor(1e6 · p_argmax)``; ``correct`` is 1 when the
    prediction matches a non-NULL label.  ``true_lang``/``correct``
    are SQL-recomputable from the pinned prediction; ``pred_lang`` and
    ``score_q`` are the replay-pinned artifacts."""
    import pandas as pd

    np = _np()
    spark = docs.sparkSession
    n_cls = len(classes)
    b_w = spark.sparkContext.broadcast(
        np.asarray(w, dtype=np.float64).tobytes())
    from image_pdf_ocr_suite_spark.partitioning import fan_out_small

    id_type = dict(docs.dtypes)[id_col]
    src = fan_out_small(docs.select(id_col, text_col, label_col))

    def kernel(batches):
        wv = np.frombuffer(b_w.value, dtype=np.float64) \
               .reshape(n_cls, dim + 1)
        for pdf in batches:
            ids, trues, preds, qs, oks = [], [], [], [], []
            memo: dict = {}
            for i, t, y in zip(pdf[id_col], pdf[text_col],
                               pdf[label_col]):
                p = _softmax_vec(wv @ _doc_vector(t, dim, memo))
                j = int(np.argmax(p))
                q = math.floor(float(p[j]) * SCORE_SCALE)
                ids.append(i)
                trues.append(y)
                preds.append(classes[j])
                qs.append(q)
                oks.append(1 if (y is not None and classes[j] == y) else 0)
            yield pd.DataFrame({id_col: ids, "true_lang": trues,
                                "pred_lang": preds, "score_q": qs,
                                "correct": oks})

    return src.mapInPandas(
        kernel,
        schema=(f"{id_col} {id_type}, true_lang string, "
                f"pred_lang string, score_q bigint, correct int"))


def replay_scores(rows: list[tuple[object, str, str]], classes: list[str],
                  w, dim: int = DIM) -> dict[object, tuple[str, int, int]]:
    """{id: (pred_lang, score_q, correct)} under weights ``w`` for
    (id, text, label) rows — the per-row scoring spelling shared with
    the kernel."""
    np = _np()
    wv = np.asarray(w, dtype=np.float64)
    out = {}
    memo: dict = {}
    for i, t, y in rows:
        p = _softmax_vec(wv @ _doc_vector(t, dim, memo))
        j = int(np.argmax(p))
        q = math.floor(float(p[j]) * SCORE_SCALE)
        out[i] = (classes[j], q, 1 if (y is not None and classes[j] == y)
                  else 0)
    return out
