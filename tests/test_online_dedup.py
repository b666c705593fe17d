"""Online near-dup admission (streaming/online_dedup.py).

Pins: the streamed admitted corpus equals an INDEPENDENT single-process
greedy replay of the documented admission law (component-min within a
batch, first-batch-wins across batches, over md5-minhash LSH candidates
verified by exact token-set Jaccard); the compacted signature layout
probes identically; a re-delivered micro-batch is a no-op; an
un-started stream reads as an empty corpus."""

from __future__ import annotations

import hashlib
import itertools

from image_pdf_ocr_suite_spark.streaming.online_dedup import (
    admitted_corpus, compact_to_index, start_online_dedup_stream)
from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable

SCHEMA = "doc_id long, text string"
THRESHOLD = 0.5
N_HASHES, SHINGLE_K = 4, 3


# ---------------------------------------------------------------------------
# independent single-process replay of the admission law
# ---------------------------------------------------------------------------

def _signature(text: str):
    toks = text.split(" ")                     # raw split, empties kept
    if len(toks) < SHINGLE_K:
        return None
    shingles = [" ".join(toks[j:j + SHINGLE_K])
                for j in range(len(toks) - SHINGLE_K + 1)]
    return tuple(
        min(hashlib.md5(f"{s}#{b}".encode()).hexdigest() for s in shingles)
        for b in range(N_HASHES))


def _jaccard(a: str, b: str) -> float:
    sa, sb = set(a.split(" ")), set(b.split(" "))
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


def _candidates(sig_a, sig_b) -> bool:
    return (sig_a is not None and sig_b is not None
            and any(x == y for x, y in zip(sig_a, sig_b)))


def _greedy_replay(batches):
    """batches: list of [(doc_id, text)] in delivery order → admitted
    {doc_id}."""
    admitted = []                              # [(id, text, sig)]
    for batch in batches:
        rows = [(i, t, _signature(t)) for i, t in batch]
        # within-batch: union-find components over verified LSH pairs
        parent = {i: i for i, _, _ in rows}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for (ia, ta, sa), (ib, tb, sb) in itertools.combinations(rows, 2):
            if _candidates(sa, sb) and _jaccard(ta, tb) >= THRESHOLD:
                ra, rb = find(ia), find(ib)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        kept = [(i, t, s) for i, t, s in rows if find(i) == i]
        # cross-batch: first batch wins
        for i, t, s in kept:
            if not any(_candidates(s, s_old)
                       and _jaccard(t, t_old) >= THRESHOLD
                       for _, t_old, s_old in admitted):
                admitted.append((i, t, s))
    return {i for i, _, _ in admitted}


# ---------------------------------------------------------------------------
# corpus: planted dup groups that straddle batch boundaries + chains
# ---------------------------------------------------------------------------

def _rows():
    base_a = ("the quick brown fox jumps over the lazy dog near the "
              "river bank today").split(" ")
    base_b = ("spark shuffles exchange partitions across executors "
              "while catalyst prunes columns during scans").split(" ")

    def doc(base, seed, mutate=0):
        toks = list(base)
        for m in range(mutate):
            toks[(seed + m * 3) % len(toks)] = f"w{seed}m{m}"
        return " ".join(toks)

    rows = []
    # group A: near-identical trio split across batches 0/1/2
    rows += [(0, doc(base_a, 1, 0)), (40, doc(base_a, 1, 1)),
             (80, doc(base_a, 1, 2))]
    # group B (disjoint vocabulary): within-batch pair
    rows += [(1, doc(base_b, 7, 0)), (2, doc(base_b, 7, 1))]
    # distinct singletons fill each batch (9 of ~14 tokens replaced
    # by unique w{seed}m{m} words -> pairwise Jaccard far below 0.5)
    rows += [(10 + i, doc(base_a, 100 + i, 9)) for i in range(8)]
    rows += [(50 + i, doc(base_a, 200 + i, 9)) for i in range(8)]
    rows += [(90 + i, doc(base_a, 300 + i, 9)) for i in range(8)]
    # a short doc (< k tokens): no signature, always admitted
    rows += [(99, "tiny doc")]
    return sorted(rows)


def _batches(rows):
    return [[(i, t) for i, t in rows if i < 40],
            [(i, t) for i, t in rows if 40 <= i < 80],
            [(i, t) for i, t in rows if i >= 80]]


def _run_stream(spark, rows, tmp_path, tag="s1"):
    input_dir = str(tmp_path / f"in_{tag}")
    for k, batch in enumerate(_batches(rows)):
        spark.createDataFrame(batch, SCHEMA).coalesce(1) \
            .write.mode("append").parquet(input_dir)
    out_root = str(tmp_path / f"out_{tag}")
    q = start_online_dedup_stream(
        spark, input_dir, SCHEMA, out_root, str(tmp_path / f"ckpt_{tag}"),
        threshold=THRESHOLD, n_hashes=N_HASHES, shingle_k=SHINGLE_K)
    q.awaitTermination(180)
    return out_root


def test_stream_matches_independent_greedy_replay(spark, tmp_path):
    rows = _rows()
    out_root = _run_stream(spark, rows, tmp_path)
    got = {r["doc_id"] for r in admitted_corpus(spark, out_root).collect()}
    want = _greedy_replay(_batches(rows))
    assert got == want
    # the law actually bit: dup-group losers rejected, keepers admitted
    assert 0 in got and 40 not in got and 80 not in got    # group A
    assert 1 in got and 2 not in got                       # group B pair
    assert 99 in got                                       # short doc


def test_replayed_batch_is_noop(spark, tmp_path):
    rows = _rows()
    out_root = _run_stream(spark, rows, tmp_path, tag="s2")
    adm_table = SnapshotTable(f"{out_root}/admitted")
    sig_table = SnapshotTable(f"{out_root}/signatures")
    before = (adm_table.read(spark).count(), sig_table.read(spark).count())
    q = start_online_dedup_stream(
        spark, str(tmp_path / "in_s2"), SCHEMA, out_root,
        str(tmp_path / "ckpt_s2b"),
        threshold=THRESHOLD, n_hashes=N_HASHES, shingle_k=SHINGLE_K)
    q.awaitTermination(180)
    after = (adm_table.read(spark).count(), sig_table.read(spark).count())
    assert after == before


def test_compacted_index_probes_identically(spark, tmp_path):
    from image_pdf_ocr_suite_spark.analytics import dedup
    rows = _rows()
    out_root = _run_stream(spark, rows, tmp_path, tag="s3")
    path = str(tmp_path / "sig_serving")
    compact_to_index(spark, out_root, path)
    probe = spark.createDataFrame(_batches(rows)[0], SCHEMA)
    via_path = dedup.dedup_against_index(
        probe, spark, path, n_hashes=N_HASHES, shingle_k=SHINGLE_K)
    via_df = dedup.dedup_against_index(
        probe, spark, None, n_hashes=N_HASHES, shingle_k=SHINGLE_K,
        index_df=SnapshotTable(f"{out_root}/signatures").read(spark))
    assert (sorted(map(tuple, via_path.collect()))
            == sorted(map(tuple, via_df.collect())))


def test_unstarted_stream_reads_empty(spark, tmp_path):
    assert admitted_corpus(spark, str(tmp_path / "none")).count() == 0
