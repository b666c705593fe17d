"""Physical-plan quality gates — the 100 TB checklist as assertions.

- the binary pages scan is column-pruned to (url, html) even though
  required-schema pruning stops at mapInPandas (explicit select upstream);
- filters reach the parquet scan (PushedFilters);
- the small dimension side of a join broadcasts;
- the relational tail runs inside WholeStageCodegen;
- no per-row Python in engine code (iterrows/itertuples lint; the
  reference model mirrors the reference's row loops on purpose and is
  exempt).
"""

import os
import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from image_pdf_ocr_suite_spark import ExtractConfig, extract_pages, fixtures

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    rows = [(i, " ".join(f"w{j}" for j in range(10)), "ja") for i in range(30)]
    spark.createDataFrame(fixtures.build_pages_pdf(rows)).write.parquet(path)
    return path


def test_pages_scan_is_column_pruned(spark, pages_parquet):
    """A job that extracts text must not read the text/lang/warc_ts columns;
    only (url, html) may reach the scan."""
    df = spark.read.parquet(pages_parquet)
    res = extract_pages(df, ExtractConfig(cache_decoded=False), run_id="plan")
    plan = _plan(res.pages)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"url", "html"}, f"scan reads {cols}"


def test_filter_pushdown_reaches_scan(spark):
    df = entrymod.q_conf_threshold_filter(spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters:" in plan
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(value,50.0\)", plan), plan


def test_join_broadcasts_small_side(spark):
    plan = _plan(entrymod.q_join_agg_segment(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_relational_tail_has_codegen(spark):
    df = entrymod.q_tpch_q1_exactstats(spark, SF_DIR)
    df.collect()  # finalize the AQE plan — codegen shows in the final plan
    plan = _plan(df)
    # "*(n)" prefixes mark WholeStageCodegen spans in the compact plan
    assert re.search(r"\*\(\d+\) HashAggregate", plan), plan


def test_ocr_stage_partitioning_is_explicit(spark, pages_parquet):
    """The exchange feeding the OCR kernel must hash on (url, page) with an
    explicit partition count (AQE must not coalesce the CPU-bound stage)."""
    df = spark.read.parquet(pages_parquet)
    res = extract_pages(df, ExtractConfig(cache_decoded=False), run_id="plan")
    plan = _plan(res.pages)
    assert re.search(r"hashpartitioning\(xxhash64\(url#\d+, page#\d+", plan), plan


# refmodel/goldens mirror the reference's row-at-a-time loops by design:
# they are the single-process oracle side, never engine code
NO_ROW_LOOPS_EXEMPT = {"refmodel.py", "goldens.py"}


def test_no_per_row_python_in_engine():
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "image_pdf_ocr_suite_spark")
    offenders = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.endswith(".py") or f in NO_ROW_LOOPS_EXEMPT:
                continue
            src = open(os.path.join(dirpath, f)).read()
            for pat in (".iterrows(", ".itertuples(", ".toLocalIterator("):
                if pat in src:
                    offenders.append((f, pat))
    assert not offenders, offenders


def test_token_count_bpe_is_map_only(spark):
    plan = _plan(entrymod.q_token_count_bpe(spark, SF_DIR))
    assert "Exchange" not in plan, plan        # pure projection, no shuffle


def test_winnow_single_shuffle(spark):
    # arrow default: per-row dedup inside the kernel + ONE global
    # distinct exchange over the pre-deduped slivers
    plan = _plan(entrymod.q_winnow_fingerprints(spark, SF_DIR))
    assert plan.count("Exchange") == 1, plan
    assert plan.count("MapInPandas") == 1, plan
    # the SQL-mirroring catalyst spelling keeps its single-shuffle,
    # zero-Python plan
    from image_pdf_ocr_suite_spark.analytics import text as textops
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cplan = _plan(textops.winnow_fingerprints(docs, impl="catalyst"))
    assert cplan.count("Exchange") == 1 and "MapInPandas" not in cplan, cplan


def test_salted_agg_two_phase_shuffles(spark):
    plan = _plan(entrymod.q_salted_user_stats(spark, SF_DIR))
    assert re.search(r"hashpartitioning\(user_id#\d+L?, __salt", plan), plan
    assert re.search(r"hashpartitioning\(user_id#\d+L?, \d+\)", plan), plan


def test_anti_join_is_hash_join(spark):
    plan = _plan(entrymod.q_anti_join_customers(spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "LeftAnti" in plan, plan


def test_near_dup_lsh_id_only_candidate_shuffle(spark):
    """The candidate-dedup exchange must carry only the id pair — vectors
    join back strictly after."""
    plan = _plan(entrymod.q_embedding_near_dup(spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    m = re.search(r"Exchange hashpartitioning\(id_a#\d+L, id_b#\d+L", plan)
    assert m, plan


def test_asof_join_single_exchange_no_range_join(spark):
    """The as-of join must be union + window (one exchange on the key,
    one sort), never a range/theta join (no BroadcastNestedLoop or
    CartesianProduct) — the range form explodes on hot keys."""
    plan = _plan(entrymod.q_asof_join_views(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan          # not even an equi-join
    assert plan.count("Window") >= 1
    # exactly one single-key exchange on user_id feeds the window (the
    # two union legs share it); the (user_id, ts) composite exchange is
    # the right-side dedup aggregate, not a second timeline shuffle
    assert len(re.findall(r"hashpartitioning\(user_id#\d+L?, \d+\)", plan)) == 1


def test_chunk_documents_is_map_only(spark):
    """Chunking must be a flatMap on the scan — zero exchanges."""
    plan = _plan(entrymod.q_chunk_documents(spark, SF_DIR))
    assert "Exchange" not in plan


def test_stratified_sample_is_scan_side_predicate(spark):
    plan = _plan(entrymod.q_stratified_sample(spark, SF_DIR))
    assert "Exchange" not in plan


def test_watermark_dedup_single_key_shuffle(spark):
    """Greedy anchor thinning is ONE shuffle on the key + a
    partition-local sort into a partition-level Pandas kernel — not
    per-group applyInPandas (measured ~4 ms/group Arrow slicing), and
    no second exchange."""
    plan = _plan(entrymod.q_watermark_dedup(spark, SF_DIR))
    assert plan.count("Exchange") == 1, plan
    assert "MapInPandas" in plan, plan
    assert re.search(r"Sort \[user_id", plan), plan


def test_bloom_probe_is_broadcast_map_side(spark):
    """The Bloom probe must resolve as k BROADCAST hash joins of the
    bounded word table — the probed gram stream itself never shuffles
    (the only exchanges are the post-flag distinct + final id count,
    carrying the flagged sliver)."""
    plan = _plan(entrymod.q_bloom_decontaminate(spark, SF_DIR))
    # arrow default: the probe is a vectorized-Python projection — the
    # gram stream never joins or shuffles; the only exchanges carry the
    # flagged (id, gram) sliver
    assert "Join" not in plan, plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan, plan
    # the SQL-mirroring join spelling stays broadcast-only
    from image_pdf_ocr_suite_spark.analytics import corpusprep
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    test = docs.where(F.col("doc_id") % 97 == 0)
    cplan = _plan(corpusprep.bloom_decontaminate(docs, test, n=5,
                                                 probe_impl="catalyst"))
    assert cplan.count("BroadcastHashJoin") >= 4, cplan
    assert "SortMergeJoin" not in cplan, cplan
    assert "CartesianProduct" not in cplan, cplan


def test_semantic_dedup_shuffles_cluster_key_only(spark):
    """SemDeDup's quadratic search must be confined within clusters: no
    cartesian/nested-loop join anywhere — the pair join keys on the
    cluster column."""
    df = entrymod.q_semantic_dedup(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    # arrow default: ONE cluster-keyed exchange feeding the partition-
    # level kernel (the quadratic search never leaves a cluster)
    assert re.search(r"hashpartitioning\(cluster#\d+", plan), plan
    assert "MapInPandas" in plan, plan
    # the SQL-mirroring catalyst spelling confines the pair search the
    # same way: an EQUI-join keyed on the cluster column
    from image_pdf_ocr_suite_spark.analytics import similarity
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cdf = similarity.semantic_dedup(emb, n_clusters=16, threshold=0.45,
                                    impl="catalyst")
    fmt = cdf._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert re.search(r"Left keys \[1\]: \[cluster#\d+\]", fmt), fmt
    assert "CartesianProduct" not in fmt, fmt


def test_warc_parse_is_map_only(spark):
    """Writer expression + parser kernel: the record walk is a pure
    mapInPandas stage — the only exchange is the blob-grouping
    aggregate upstream of the writer."""
    plan = _plan(entrymod.q_warc_extract(spark, SF_DIR))
    assert plan.count("MapInPandas") == 1, plan
    assert plan.count("Exchange") <= 2, plan
