"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — JVM-side ``zip_with`` /
  ``aggregate`` dot product in float64, no Python in the loop.  The
  baseline and the verifier for the approximate path.
- ``lsh_cosine_topk``: random-hyperplane LSH (sign sketch) — the scale
  path: bucket by sketch prefix, search only the query's bucket
  neighborhood.  Hyperplanes are seeded-deterministic and broadcast as
  literals; at 100 TB the bucketing turns a full scan into a partition-
  pruned fraction (trade recall for scan size; k-probe widens recall).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_expr(col_a, col_b):
    """Cosine similarity between two array<double> columns (float64 math)."""
    return _dot(col_a, col_b) / (F.sqrt(_dot(col_a, col_a)) * F.sqrt(_dot(col_b, col_b)))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 20,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force top-k by cosine similarity to a literal query
    vector; deterministic tie-break on id."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = F.col(vec_col).cast("array<double>")
    scored = df.select(F.col(id_col), cosine_expr(emb, q).alias("sim"))
    return scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def sketch_expr(vec_col, planes: np.ndarray):
    """Sign sketch as a bigint: bit i = 1 iff <v, h_i> > 0.  Pure Catalyst
    (one aggregate per plane over the array column)."""
    emb = F.col(vec_col).cast("array<double>")
    bits = F.lit(0).cast("long")
    for i, row in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in row])
        bits = bits + F.when(_dot(emb, plane) > 0, F.lit(1 << i).cast("long")) \
                       .otherwise(F.lit(0).cast("long"))
    return bits


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.3,
                             vec_col: str = "embedding", id_col: str = "vec_id",
                             max_id: int | None = 150) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    Demo/verification form is a bounded self-join with exact f64 cosine; the
    scale path buckets by the sign sketch first (sketch equality or small
    Hamming distance) so only candidate buckets join — same pattern as
    lsh_cosine_topk."""
    emb = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col), emb.alias("v"))
    if max_id is not None:
        base = base.where(F.col(id_col) < max_id)
    a, b = base.alias("a"), base.alias("b")
    sim = cosine_expr(F.col("a.v"), F.col("b.v"))
    return (a.crossJoin(b)
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    sim.alias("cosine"))
            .where(F.col("cosine") >= F.lit(threshold)))


def lsh_cosine_topk(df: DataFrame, query_vec: list[float], k: int = 20,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    n_planes: int = 12, max_hamming: int = 2,
                    seed: int = 42) -> DataFrame:
    """Approximate top-k: candidates = vectors whose sign sketch is within
    ``max_hamming`` bits of the query's sketch; exact rerank inside."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    q_sketch = int(sum((1 << i) for i, h in enumerate(planes) if float(h @ qv) > 0))

    sk = sketch_expr(vec_col, planes)
    cand = df.select(F.col(id_col), F.col(vec_col), sk.alias("sketch"))
    cand = cand.where(
        F.bit_count(F.col("sketch").bitwiseXOR(F.lit(q_sketch))) <= max_hamming)

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = F.col(vec_col).cast("array<double>")
    scored = cand.select(F.col(id_col), cosine_expr(emb, q).alias("sim"))
    return scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)
