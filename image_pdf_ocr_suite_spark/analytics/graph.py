"""Link-graph analytics over extracted web-page hyperlinks.

The Common-Crawl-style corpus this engine targets (BASELINE.json
north_star) is a web graph: pages link to pages, and corpus curation
uses graph signals — outdegree/indegree quality filters, and PageRank
for crawl-frontier prioritisation and spam demotion.  The reference
suite has no graph layer; this is a task-mandated LLM-pipeline addition
(SURVEY §2 family), built Spark-first next to the connected-components
operators (dedup.py).

PageRank here is **integer-scaled**: every rank is a BIGINT in units of
``1/scale``, contributions use floor division, and each round is
``new = (100-d)%·scale//100 + d%·Σ(rank_src // outdeg_src)//100``.
Integer sums are order-independent, so Spark and any SQL engine compute
bit-identical ranks — the property that lets the DuckDB oracle check
PageRank *exactly* instead of within a float tolerance (the repo-wide
cross-engine float rule).  The classic float formulation differs only
by O(n_iter/scale) per rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def degree_stats(edges: DataFrame, src: str = "src",
                 dst: str = "dst") -> DataFrame:
    """Per-node (node, out_deg, in_deg) — two map-side-combinable counts
    and one outer join on the node key; no data-sized state."""
    od = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("out_deg"))
    ind = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("in_deg"))
    return (od.join(ind, "node", "full")
            .select("node",
                    F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                    F.coalesce("in_deg", F.lit(0)).alias("in_deg")))


def anchor_text_stats(links: DataFrame, target: str = "resolved",
                      anchor: str = "anchor",
                      source: str = "url") -> DataFrame:
    """Per-target anchor-text aggregation — the classic web-corpus
    signal (anchor text describes the TARGET page; search engines and
    quality classifiers consume it aggregated per destination).

    ``(target, n_refs, n_sources, n_anchors, top_anchor, top_anchor_n)``
    where ``top_anchor`` is the most frequent non-empty anchor string
    for the target (ties broken lexicographically — deterministic
    cross-engine).

    Scale shape: the heavy aggregate runs on ``(target, anchor)`` —
    map-side combinable, anchor strings are short, the raw HTML never
    shuffles (link extraction upstream is map-only).  The winner pick
    is ``min_by`` over a (negated count, anchor) struct on the
    already-collapsed per-anchor counts — no window over raw rows.  The
    exact distinct-source count is its own short-key aggregate joined
    back on the target key (two short shuffles, zero data-sized
    state)."""
    nonempty = links.where(
        F.col(anchor).isNotNull() & (F.col(anchor) != ""))
    per_anchor = (nonempty
                  .groupBy(F.col(target).alias("target"),
                           F.col(anchor).alias("__a"))
                  .agg(F.count(F.lit(1)).cast("bigint").alias("__n")))
    winners = per_anchor.groupBy("target").agg(
        F.sum("__n").alias("n_refs"),
        F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
        F.min_by("__a", F.struct((-F.col("__n")).alias("k1"),
                                 F.col("__a").alias("k2")))
         .alias("top_anchor"),
        F.max("__n").alias("top_anchor_n"))
    sources = (nonempty
               .groupBy(F.col(target).alias("target"))
               .agg(F.countDistinct(F.col(source)).cast("bigint")
                     .alias("n_sources")))
    return winners.join(sources, "target").select(
        "target", "n_refs", "n_sources", "n_anchors",
        "top_anchor", "top_anchor_n")


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             nodes: DataFrame | None = None, n_iter: int = 5,
             damping_pct: int = 85, scale: int = 10 ** 9) -> DataFrame:
    """Integer-scaled PageRank: ``(node, rank)`` with rank a BIGINT in
    units of ``1/scale`` (initial rank = ``scale``, i.e. 1.0 per node).

    ``damping_pct`` is the damping factor in percent (85 = classic 0.85);
    dangling nodes leak their mass (standard simplification, identical in
    the oracle).  Pick ``scale`` so ``n_nodes * scale * 100 < 2**63``
    (10**9 up to ~9 × 10**10 nodes; drop to 10**4 at the 10**12-document
    tier — precision degrades gracefully, overflow does not).

    Scale shape: each round is one join of the rank table against the
    static ``(src, dst, out_deg)`` edge relation plus one
    map-side-combinable ``groupBy(dst).sum``.  The edge relation is
    hash-partitioned on ``src`` ONCE and localCheckpointed, so every
    round's join reuses that layout and only the (node, rank) table —
    one row per node — reshuffles.  ``n_iter`` is bounded and small
    (default 5): iterated-localCheckpoint loops degrade superlinearly
    past ~18 rounds in a shared JVM (measured, CLAUDE.md round-4 rule);
    web-ranking uses O(10) rounds in practice."""
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    if nodes is None:
        nodes = (edges.select(F.col(src).alias("node"))
                 .union(edges.select(F.col(dst).alias("node"))).distinct())
    else:
        cols = nodes.columns
        nodes = nodes.select(F.col(cols[0]).alias("node")).distinct()
    nodes = nodes.localCheckpoint()

    outdeg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__od"))
    rel = (edges.select(src, dst).join(outdeg, src)
           .select(F.col(src).alias("__src"), F.col(dst).alias("__dst"),
                   F.col("__od"))
           .repartition("__src")            # layout reused every round
           .localCheckpoint())

    base = ((100 - damping_pct) * scale) // 100
    ranks = nodes.select("node", F.lit(scale).cast("bigint").alias("rank"))
    for _ in range(n_iter):
        contrib = (rel.join(ranks, rel["__src"] == ranks["node"])
                   .select(F.col("__dst").alias("node"),
                           F.expr("rank div __od").alias("__c")))
        summed = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        ranks = (nodes.join(summed, "node", "left")
                 .select("node",
                         (F.lit(base)
                          + F.expr(f"{damping_pct} * coalesce(__s, CAST(0 AS BIGINT)) div 100"))
                         .cast("bigint").alias("rank"))
                 .localCheckpoint())
    return ranks
