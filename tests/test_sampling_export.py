"""Cluster-balanced sampling (analytics/sampling.py) and the
training-shard export job (jobs/export_job.py).  Cross-engine parity is
covered by the registry rows `cluster_balanced_sample` /
`export_windows`; these pin the engine-side contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import sampling
from jobs.export_job import main as export_main
from jobs.export_job import (SOURCE_IDS_SEP, pack_windows,
                             shard_manifest)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_cbs_quota_enforced_and_partitioning_invariant(emb):
    a = sampling.cluster_balanced_sample(emb, quota=20, n_clusters=16)
    rows = a.collect()
    per = {}
    for r in rows:
        per.setdefault(r["cluster"], []).append(r)
    for cl, members in per.items():
        kept = [r for r in members if r["kept"]]
        assert len(kept) == min(20, len(members)), cl
        assert all(r["rk"] <= 20 for r in kept)
    b = sampling.cluster_balanced_sample(emb.repartition(17), quota=20,
                                         n_clusters=16).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, b))


def test_cbs_share_report_sums(emb):
    s = sampling.cluster_balanced_sample(emb, quota=20, n_clusters=16)
    rep = sampling.cluster_share_report(s).collect()
    assert sum(r["n_total"] for r in rep) == \
        emb.where(F.col("embedding").isNotNull()).count()
    assert all(r["n_kept"] == min(20, r["n_total"]) for r in rep)


def test_cbs_rejects_bad_quota(emb):
    with pytest.raises(ValueError):
        sampling.cluster_balanced_sample(emb, quota=0)


def test_pack_windows_capacity_and_provenance(docs):
    win = pack_windows(docs, capacity=256, n_shards=8).collect()
    assert win
    for r in win:
        # a window's tokens stay within capacity + one max-size chunk - 1
        # (the chunk that straddles the boundary belongs to its start bin)
        assert r["n_tokens"] <= 256 + 50 - 1
        assert r["n_chunks"] >= 1
        assert r["source_ids"]
        # chunks join with single spaces, so the window's whitespace
        # token count equals the summed chunk token counts exactly
        assert len([t for t in r["window_text"].split(" ") if t]) == \
            r["n_tokens"]
    # every non-empty doc appears in some window's provenance
    doc_ids = {str(r["doc_id"]) for r in
               docs.where(F.length("text") > 0).select("doc_id").collect()}
    seen = set()
    for r in win:
        seen.update(r["source_ids"].split(SOURCE_IDS_SEP))
    assert doc_ids <= seen


def test_pack_windows_partitioning_invariant(docs):
    a = pack_windows(docs, capacity=256, n_shards=8).collect()
    b = pack_windows(docs.repartition(13), capacity=256,
                     n_shards=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_manifest_sums_match_windows(docs):
    win = pack_windows(docs, capacity=256, n_shards=8)
    man = shard_manifest(win).collect()
    rows = win.collect()
    assert sum(r["n_windows"] for r in man) == len(rows)
    assert sum(r["n_tokens"] for r in man) == sum(r["n_tokens"]
                                                  for r in rows)


def test_export_job_cli_commits_and_replays(spark, docs, tmp_path):
    inp = str(tmp_path / "clean.parquet")
    docs.select("doc_id", "text").write.parquet(inp)
    out = str(tmp_path / "out")
    export_main(["--input-table", inp, "--output-root", out,
                 "--n-shards", "4", "--run-id", "r1"],
                stop_session=False)
    from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable
    shards = SnapshotTable(f"{out}/shards").read(spark)
    direct = pack_windows(docs.select("doc_id", "text"), capacity=256,
                          n_shards=4)
    assert sorted(map(tuple, shards.collect())) == \
        sorted(map(tuple, direct.collect()))
    man = SnapshotTable(f"{out}/manifest").read(spark).collect()
    assert sum(r["n_windows"] for r in man) == shards.count()
    # replaying the SAME run_id commits nothing new (exactly-once)
    n_before = len(SnapshotTable(f"{out}/shards").snapshots())
    export_main(["--input-table", inp, "--output-root", out,
                 "--n-shards", "4", "--run-id", "r1"],
                stop_session=False)
    assert len(SnapshotTable(f"{out}/shards").snapshots()) == n_before
    assert SnapshotTable(f"{out}/shards").read(spark).count() == \
        shards.count()


def test_provenance_survives_ids_containing_commas(spark):
    # --id-col url with query strings: a comma in the id must not
    # fragment provenance (review fix: unit-separator join/split)
    rows = [(f"http://x.com/p?ids=1,2&d={i}", "alpha beta gamma " * 20)
            for i in range(4)]
    docs = spark.createDataFrame(rows, "url string, text string")
    win = pack_windows(docs, capacity=64, n_shards=2, id_col="url",
                       text_col="text")
    man = {r["shard"]: r["n_docs"] for r in shard_manifest(win).collect()}
    per_shard = {r["shard"]: r["n"] for r in
                 win.select("shard", F.explode(
                     F.split("source_ids", SOURCE_IDS_SEP)).alias("id"))
                 .groupBy("shard")
                 .agg(F.countDistinct("id").alias("n")).collect()}
    assert man == per_shard
    assert sum(man.values()) == 4  # every id intact, none fragmented
