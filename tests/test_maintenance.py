"""Table maintenance: snapshot expiry + orphan-file GC + time travel,
tombstone watermarks, and the cross-process commit lock."""

from __future__ import annotations

import multiprocessing as mp
import os

import pyspark.sql.types as T
from pyspark.sql import functions as F

from pentaho_kettle_spark.tableio.parquet_snapshot import ParquetSnapshotTableIO

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("v", T.DoubleType()),
    T.StructField("ts", T.LongType()),
])


def _mk(spark, root, **kw):
    t = ParquetSnapshotTableIO(
        spark, root, key_cols=("k",), lww_col="ts", n_buckets=4, **kw
    )
    t.init_empty(SCHEMA)
    return t


def _changes(spark, rows):
    """rows: (k, v, ts, seq, op)"""
    sch = "k string, v double, ts long, _seq long, op string"
    return spark.createDataFrame(rows, sch).select("k", "v", "ts", "op", "_seq")


def test_expire_snapshots_gc_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t1")
    t = _mk(spark, root)
    for i in range(5):
        t.merge_apply(
            _changes(spark, [(f"k{i}", float(i), 100 + i, i, "U")]),
            batch_id=f"b{i}",
        )
    all_ids = t.snapshot_ids()
    assert len(all_ids) == 6  # init + 5 merges
    mid_id = all_ids[-2]  # will be retained
    old_id = all_ids[1]  # will expire

    res = t.expire_snapshots(keep_last=2, grace_seconds=0.0)
    assert old_id in res["expired_snapshots"]
    assert t.snapshot_ids() == all_ids[-2:]

    # current read unaffected
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {f"k{i}": float(i) for i in range(5)}

    # time travel within the retained window still works
    prev = {r.k: r.v for r in t.read_at(mid_id).collect()}
    assert prev == {f"k{i}": float(i) for i in range(4)}

    # expired snapshot raises
    try:
        t.read_at(old_id)
        raise AssertionError("expected ValueError for expired snapshot")
    except ValueError:
        pass

    # every remaining data file is referenced by a retained manifest
    referenced = set()
    for i in t.snapshot_ids():
        for es in t.manifest_at(i)["files"].values():
            referenced.update(e["path"] for e in es)
    on_disk = set()
    for dirpath, _d, fns in os.walk(os.path.join(root, "data")):
        for fn in fns:
            if fn.endswith(".parquet"):
                on_disk.add(os.path.relpath(os.path.join(dirpath, fn), root))
    assert on_disk == referenced


def test_expire_snapshots_grace_keeps_young_orphans(spark, tmp_path):
    root = str(tmp_path / "t2")
    t = _mk(spark, root)
    t.merge_apply(_changes(spark, [("a", 1.0, 1, 1, "U")]), batch_id="b0")
    # fake an uncommitted writer's fresh file
    orphan = os.path.join(root, "data", "w-orphan", "_bucket=0")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-x.parquet"), "wb") as f:
        f.write(b"x")
    res = t.expire_snapshots(keep_last=1, grace_seconds=3600.0)
    assert res["deleted_files"] == 0  # young orphan survives the grace window
    res2 = t.expire_snapshots(keep_last=1, grace_seconds=0.0)
    assert res2["deleted_files"] == 1  # grace elapsed -> collected


def test_tombstone_watermark(spark, tmp_path):
    root = str(tmp_path / "t3")
    t = _mk(spark, root)
    t.merge_apply(
        _changes(spark, [("k1", 1.0, 10, 1, "U"), ("k2", 2.0, 10, 2, "U")]),
        batch_id="seed",
    )
    # delete k1 recently (ts 100), k2 long ago (ts 20)
    t.merge_apply(
        _changes(spark, [("k1", None, 100, 3, "D"), ("k2", None, 20, 4, "D")]),
        batch_id="del",
    )
    t.expire_tombstones(watermark=50)
    full = t.read_full()
    stones = {r.k for r in full.filter(F.col("_deleted")).collect()}
    assert stones == {"k1"}  # k1's tombstone retained (>= watermark), k2's dropped
    # a late stale update for k1 (older than its tombstone) still loses
    t.merge_apply(_changes(spark, [("k1", 9.0, 60, 5, "U")]), batch_id="late")
    assert t.read().filter(F.col("k") == "k1").isEmpty()


def _bump_worker(root: str, n: int) -> None:
    from pentaho_kettle_spark.tableio.parquet_snapshot import ParquetSnapshotTableIO

    t = ParquetSnapshotTableIO(None, root)
    for _ in range(n):
        def mut(cur: dict) -> dict:
            out = dict(cur)
            out["lineage"] = [*cur["lineage"], {"mode": "test-bump", "pid": os.getpid()}]
            return out

        t._commit_mutation(mut)


def test_cross_process_commit_lock(tmp_path):
    """Two writer PROCESSES bumping the manifest concurrently must not lose
    updates (the flock CAS extends the in-process commit lock)."""
    root = str(tmp_path / "t4")
    t = ParquetSnapshotTableIO(None, root)
    t.init_empty(SCHEMA)
    n = 25
    ctx = mp.get_context("spawn")
    ps = [ctx.Process(target=_bump_worker, args=(root, n)) for _ in range(2)]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=120)
        assert p.exitcode == 0
    m = t.current_manifest()
    assert m["snapshot_id"] == 2 * n
    assert len(m["lineage"]) == 2 * n  # no lost updates
