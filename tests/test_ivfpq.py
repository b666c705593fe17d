"""IVF-PQ composed index (analytics/ivfpq.py): both prunings must
compose in ONE scan — PartitionFilters on the coarse list AND a
ReadSchema restricted to (id, codes) — and results must equal the
flat-PQ ADC restricted to the probed lists.  Cross-engine parity is
covered by the registry row `ivfpq_topk` (test_oracle_parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.analytics import ivfpq, pq, similarity

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def index(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    cent, books = ivfpq.ivfpq_write_index(emb, path, n_lists=16,
                                          m_sub=8, n_codes=16)
    return path, cent, books


def _qvec(emb, vid=0):
    return [float(x) for x in emb.where(F.col("vec_id") == vid)
            .select("embedding").head()[0]]


def test_ivfpq_equals_flat_pq_on_probed_lists(spark, emb, index):
    """ADC over the probed partitions == flat PQ ADC restricted to the
    same coarse lists (codes are a pure function of the vector — the
    non-residual design's whole point)."""
    path, cent, books = index
    qvec = _qvec(emb)
    got = [(r[0], r[1]) for r in
           ivfpq.ivfpq_topk(spark, path, qvec, k=10, n_probe=4).collect()]
    probe = similarity._probe_lists(cent, qvec, 4)
    member = emb.where(F.col("embedding").isNotNull()).select(
        "vec_id", "embedding",
        similarity.ivf_list_expr("embedding", cent).alias("lst"))
    subset = member.where(F.col("lst").isin(probe)).drop("lst")
    want = [(r[0], r[1]) for r in
            pq.pq_topk(subset, qvec, k=10, codebooks=books).collect()]
    assert got == want


def test_ivfpq_scan_composes_both_prunings(spark, emb, index):
    """THE plan assertion: one scan with PartitionFilters on ivf_list
    (n_probe/n_lists of the files) AND a ReadSchema of (vec_id, code)
    only (no embedding bytes)."""
    path, cent, _ = index
    qvec = _qvec(emb)
    df = ivfpq.ivfpq_topk(spark, path, qvec, k=10, n_probe=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan"):]
    pf = scan[scan.index("PartitionFilters"):][:220]
    assert "ivf_list" in pf
    rs = scan[scan.index("ReadSchema"):][:220]
    assert "code" in rs and "embedding" not in rs


def test_ivfpq_rerank_recovers_exact_head(spark, emb, index):
    """Exact-cosine rerank of 100 ADC candidates inside 8 probed lists
    must recover the true top-3 head on the fixture."""
    path, _, _ = index
    qvec = _qvec(emb, vid=3)
    rr = ivfpq.ivfpq_topk(spark, path, qvec, k=5, n_probe=8,
                          rerank=100).collect()
    exact = similarity.cosine_topk(emb, qvec, k=5).collect()
    assert [r[0] for r in rr[:3]] == [r[0] for r in exact[:3]]
    assert len({r[0] for r in rr} & {r[0] for r in exact}) >= 4


def test_ivfpq_build_single_pass_one_exchange(spark, emb, index):
    """The build projection computes coarse list + codes together: the
    written table's row count equals the non-null vector count and every
    row's list matches a fresh assignment (no drift between sidecar and
    layout)."""
    path, cent, _ = index
    stored = spark.read.parquet(path)
    n = emb.where(F.col("embedding").isNotNull()).count()
    assert stored.count() == n
    fresh = emb.where(F.col("embedding").isNotNull()).select(
        "vec_id", similarity.ivf_list_expr("embedding", cent).alias("want"))
    joined = stored.select("vec_id", "ivf_list").join(fresh, "vec_id")
    assert joined.where(F.col("ivf_list") != F.col("want")).count() == 0
