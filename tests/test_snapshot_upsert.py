"""Iceberg-style table maintenance: upsert (MERGE), compaction, snapshot
expiry."""

import os

from image_pdf_ocr_suite_spark.tableio.snapshot import SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_upsert_replaces_by_key(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_df(spark, [("u1", "old1"), ("u2", "old2"), ("u3", "keep")]), "r1")
    t.upsert(_df(spark, [("u1", "new1"), ("u4", "new4")]), "url", "r2")
    got = {r["url"]: r["text"] for r in t.read(spark).collect()}
    assert got == {"u1": "new1", "u2": "old2", "u3": "keep", "u4": "new4"}
    assert t.current_snapshot().op == "replace"


def test_upsert_on_empty_table_appends(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.upsert(_df(spark, [("u1", "a")]), "url", "r1")
    assert t.read(spark).count() == 1
    assert t.current_snapshot().op == "append"


def test_compact_then_append_then_read(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_df(spark, [("u1", "a")]), "r1")
    t.append(_df(spark, [("u2", "b")]), "r2")
    t.compact(spark, "maint", n_files=1)
    t.append(_df(spark, [("u3", "c")]), "r3")
    got = {r["url"]: r["text"] for r in t.read(spark).collect()}
    assert got == {"u1": "a", "u2": "b", "u3": "c"}


def test_expire_snapshots_removes_dead_dirs_only(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    s1 = t.append(_df(spark, [("u1", "a")]), "r1")
    s2 = t.append(_df(spark, [("u2", "b")]), "r2")
    t.compact(spark, "maint")
    s4 = t.append(_df(spark, [("u3", "c")]), "r3")
    removed = t.expire_snapshots()
    assert set(removed) == {s1.data_dir, s2.data_dir}
    assert os.path.isdir(s4.data_dir)
    got = {r["url"] for r in t.read(spark).collect()}
    assert got == {"u1", "u2", "u3"}


def test_resume_respects_replace(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_df(spark, [("u1", "a"), ("u2", "b")]), "r1")
    t.upsert(_df(spark, [("u2", "b2")]), "url", "r2")
    inp = _df(spark, [("u1", "x"), ("u2", "x"), ("u3", "x")])
    remaining = {r["url"] for r in t.remaining_input(inp, "url").collect()}
    assert remaining == {"u3"}


def test_time_travel_read_at(spark, tmp_path):
    """VERSION AS OF: each snapshot id reproduces the table exactly as
    committed then, including across a replace (upsert) boundary."""
    import pytest
    t = SnapshotTable(str(tmp_path / "t"))
    s1 = t.append(_df(spark, [("u1", "a"), ("u2", "b")]), "r1")
    s2 = t.append(_df(spark, [("u3", "c")]), "r2")
    s3 = t.upsert(_df(spark, [("u1", "A")]), "url", "r3")
    s4 = t.append(_df(spark, [("u4", "d")]), "r4")

    def at(s):
        return {r["url"]: r["text"] for r in t.read_at(spark, s.snapshot_id).collect()}

    assert at(s1) == {"u1": "a", "u2": "b"}
    assert at(s2) == {"u1": "a", "u2": "b", "u3": "c"}
    assert at(s3) == {"u1": "A", "u2": "b", "u3": "c"}
    assert at(s4) == {"u1": "A", "u2": "b", "u3": "c", "u4": "d"}
    # current read == latest snapshot read
    assert at(s4) == {r["url"]: r["text"] for r in t.read(spark).collect()}
    with pytest.raises(KeyError):
        t.read_at(spark, "nonexistent")


def test_time_travel_read_asof_timestamp(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    s1 = t.append(_df(spark, [("u1", "a")]), "r1")
    s2 = t.append(_df(spark, [("u2", "b")]), "r2")
    # between the two commits
    mid = (s1.committed_at + s2.committed_at) / 2
    assert t.read_asof(spark, mid).count() == 1
    assert t.read_asof(spark, s2.committed_at + 1).count() == 2
    assert t.read_asof(spark, s1.committed_at - 1) is None
