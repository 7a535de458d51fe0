"""SnapshotTable semantics: isolation, atomic commit, base-pinned appends,
expiry — the Iceberg behaviours the crawl loop depends on."""

import shutil
import tempfile

import pytest
from pyspark.sql import Row

from pink_spider_spark.sources.tables import SnapshotTable, TableStore


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="tbl_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, vals):
    return spark.createDataFrame([Row(x=v) for v in vals])


def test_append_and_snapshot_isolation(spark, root):
    t = SnapshotTable(root, "t")
    s1 = t.append(_df(spark, [1, 2]))
    s2 = t.append(_df(spark, [3]))
    assert {r.x for r in t.read(spark).collect()} == {1, 2, 3}
    assert {r.x for r in t.read(spark, snapshot=s1).collect()} == {1, 2}
    assert t.current_snapshot() == s2


def test_overwrite_replaces(spark, root):
    t = SnapshotTable(root, "t")
    t.append(_df(spark, [1, 2]))
    t.overwrite(_df(spark, [9]))
    assert {r.x for r in t.read(spark).collect()} == {9}


def test_base_pinned_append_skips_orphans(spark, root):
    """A crashed wave's orphan append must not leak into the resumed
    wave's snapshot when the resume pins the last committed base."""
    t = SnapshotTable(root, "t")
    committed = t.append(_df(spark, [1]))
    t.append(_df(spark, [99]))  # orphan: never entered a checkpoint
    resumed, _d = t.append_returning_dir(_df(spark, [2]), base_snapshot=committed)
    assert {r.x for r in t.read(spark, snapshot=resumed).collect()} == {1, 2}


def test_expire_snapshots_drops_unreferenced_dirs(spark, root):
    t = SnapshotTable(root, "t")
    t.overwrite(_df(spark, [1]))
    old_dirs = set(t.snapshot_dirs())
    t.overwrite(_df(spark, [2]))
    t.expire_snapshots(keep_last=1)
    import os
    for d in old_dirs:
        assert not os.path.exists(d)
    assert {r.x for r in t.read(spark).collect()} == {2}


def test_checkpoint_roundtrip(spark, root):
    store = TableStore(root)
    assert store.read_checkpoint() is None
    store.commit_checkpoint(3, {"t": 2}, counters={"seen": 7})
    ck = store.read_checkpoint()
    assert ck["wave"] == 3 and ck["snapshots"]["t"] == 2
    assert ck["counters"]["seen"] == 7


def test_compact_binpacks_small_dirs(spark, root):
    t = SnapshotTable(root, "t")
    for i in range(5):
        t.append(_df(spark, [i]))
    before = t.snapshot_dirs()
    assert len(before) == 5
    sid = t.compact(spark, small_bytes=1 << 20, target_bytes=1 << 20)
    assert sid is not None
    after = t.snapshot_dirs()
    assert len(after) == 1
    assert {r.x for r in t.read(spark).collect()} == {0, 1, 2, 3, 4}
    # previous snapshot still time-travel readable until expiry
    assert {r.x for r in t.read(spark, snapshot=sid - 1).collect()} == {0, 1, 2, 3, 4}


def test_compact_skips_big_dirs_and_below_min(spark, root):
    t = SnapshotTable(root, "t")
    t.append(_df(spark, [1]))
    t.append(_df(spark, [2]))
    assert t.compact(spark, min_dirs=4) is None  # too few small dirs
    for i in range(3, 7):
        t.append(_df(spark, [i]))
    # all dirs "big": nothing qualifies as small
    assert t.compact(spark, small_bytes=1, min_dirs=2) is None
    sid = t.compact(spark, small_bytes=1 << 20, min_dirs=2)
    assert sid is not None and len(t.snapshot_dirs()) == 1


def test_compact_aborts_on_concurrent_commit(spark, root, monkeypatch):
    """Iceberg-style validation: a commit landing mid-rewrite aborts the
    compaction instead of publishing a stale file list."""
    t = SnapshotTable(root, "t")
    for i in range(4):
        t.append(_df(spark, [i]))
    real_write = t._write_dir

    def write_then_race(df):
        path = real_write(df)
        t2 = SnapshotTable(root, "t")  # concurrent writer
        t2.append(_df(spark, [99]))
        return path

    monkeypatch.setattr(t, "_write_dir", write_then_race)
    assert t.compact(spark, small_bytes=1 << 20, min_dirs=2) is None
    assert {r.x for r in t.read(spark).collect()} == {0, 1, 2, 3, 99}


def test_merge_upsert_semantics(spark, root):
    """MERGE INTO analog: matched keys update, unmatched insert,
    untouched rows survive, and the pre-merge snapshot stays readable."""
    t = SnapshotTable(root, "dim")
    t.append(spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]))
    pre = t.current_snapshot()
    sid = t.merge(spark, spark.createDataFrame(
        [Row(k=2, v="B2"), Row(k=9, v="new")]), ["k"])
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 9: "new"}
    # time travel: the parent snapshot is unchanged
    old = {r.k: r.v for r in t.read(spark, snapshot=pre).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}
    assert sid > pre


def test_merge_duplicate_source_rows_pass_through(spark, root):
    t = SnapshotTable(root, "dim2")
    t.append(spark.createDataFrame([Row(k=1, v="a")]))
    t.merge(spark, spark.createDataFrame(
        [Row(k=1, v="x"), Row(k=1, v="x")]), ["k"])
    rows = t.read(spark).collect()
    assert {(r.k, r.v) for r in rows} == {(1, "x")}
    assert len(rows) == 2  # both source rows land (MERGE dedup is the
    # caller's contract, same as Iceberg's cardinality check would flag)
