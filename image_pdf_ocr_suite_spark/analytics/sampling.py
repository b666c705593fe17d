"""Cluster-balanced corpus sampling — the topic-balance pass of a
training-data mixer: cap any one embedding cluster's share of the
corpus so a dominant topic (or a crawl loop's near-identical pages)
cannot crowd the mixture.  The companion to SemDeDup (which removes
near-duplicates WITHIN a cluster) and DSIR (which reweights toward a
target distribution); this op enforces a hard per-cluster quota.

Shape:

- clusters come from the SHARED spherical-k-means quantizer
  (similarity.train_centroids_np — bounded deterministic sample, the
  IVF recipe), assigned with the bit-exact sequential dot chains, so
  the DuckDB oracle replays assignment from retrained pinned literals;
- the within-cluster keep-order is the repo's deterministic-sampling
  contract (text.md5_bucket_expr's idiom): rank by
  ``(md5_48(id), id)`` — reproducible across runs, engines, and
  partitionings, and unbiased w.r.t. any corpus ordering;
- one shuffle, keyed by cluster, carrying ``(id, cluster, hash)``
  short keys only — embeddings never ride it;
- output keeps EVERY row with its ``(cluster, rk, kept)`` verdict so
  downstream stages can log attrition per cluster.

At 100 TB: the quantizer is a broadcast constant, assignment is
map-only, and the quota window shuffles ~24 bytes/row.  For quotas in
the millions per cluster the window sort is the cost — if that bites,
swap rank for the two-pass histogram + per-cluster hash-threshold
variant (count per cluster, then keep hash < quota/count-scaled cutoff)
at the price of an approximate quota.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from image_pdf_ocr_suite_spark.analytics.similarity import (
    ivf_list_expr, ivf_list_np, train_ivf_centroids)


def keep_hash_expr(id_col: str):
    """Deterministic 48-bit keep-order hash of the id — the ONE
    repo-wide md5 contract (`sketches.hash48_expr`; every oracle
    restates it as `CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1,
    12) AS BIGINT)`)."""
    from image_pdf_ocr_suite_spark.analytics.sketches import hash48_expr

    return hash48_expr(id_col)


def cluster_balanced_sample(df: DataFrame, quota: int, n_clusters: int = 16,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            centroids: np.ndarray | None = None,
                            assign_impl: str = "auto") -> DataFrame:
    """``(id, cluster int, rk int, kept boolean)`` for every row with a
    non-null vector: ``kept`` ⇔ the row's deterministic rank within its
    cluster is ≤ ``quota``.

    ``assign_impl`` follows the IVF convention: "catalyst" = bit-exact
    sequential dot chains (what the pinned-centroid oracle replicates),
    "numpy" = Arrow matmul kernel (the 100 TB path), "auto" = catalyst
    while n_clusters·dim fits the interpreted-HOF budget."""
    if quota < 1:
        raise ValueError(f"quota must be >= 1 (got {quota})")
    if centroids is None:
        centroids = train_ivf_centroids(df, n_clusters, vec_col, id_col)
    if assign_impl == "auto":
        assign_impl = ("catalyst"
                       if centroids.shape[0] * centroids.shape[1] <= 1024
                       else "numpy")
    cluster = (ivf_list_expr(vec_col, centroids)
               if assign_impl == "catalyst"
               else ivf_list_np(F.col(vec_col), centroids))
    assigned = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), cluster.alias("cluster"),
        keep_hash_expr(id_col).alias("__kh"))
    w = Window.partitionBy("cluster").orderBy(F.asc("__kh"), F.asc(id_col))
    ranked = assigned.select(
        id_col, "cluster",
        F.row_number().over(w).cast("int").alias("rk"))
    return ranked.select(id_col, "cluster", "rk",
                         (F.col("rk") <= quota).alias("kept"))


def cluster_share_report(sample: DataFrame) -> DataFrame:
    """Per-cluster attrition: ``(cluster, n_total, n_kept)`` — the
    mixer's balance log, a ≤n_clusters-row aggregate."""
    return (sample.groupBy("cluster")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_total"),
                 F.sum(F.col("kept").cast("bigint")).cast("bigint")
                  .alias("n_kept"))
            .orderBy("cluster"))
