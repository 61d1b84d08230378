"""Incremental changes-read (Iceberg changelog scan analog):
read_changes(a, b) = net insert/update/delete between two snapshots,
reading only the buckets the interval touched."""

import pyspark.sql.types as T
from pyspark.sql import functions as F

from pentaho_kettle_spark.tableio.parquet_snapshot import ParquetSnapshotTableIO


SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _mk(spark, tmp_path, **kw):
    t = ParquetSnapshotTableIO(
        spark,
        str(tmp_path / "t"),
        key_cols=("conv_id", "turn_idx"),
        lww_col="ts",
        n_buckets=4,
        **kw,
    )
    t.init_empty(SCHEMA)
    return t


def _batch(spark, rows):
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [
            (c, i, x, base + dt.timedelta(seconds=s), s, op)
            for (c, i, x, s, op) in rows
        ],
        "conv_id string, turn_idx int, text string, ts timestamp, seq long, op string",
    )


def _apply(t, b, bid):
    from pentaho_kettle_spark.cdc.replay import apply_batch

    apply_batch(t, b, batch_id=bid)


def test_insert_update_delete_classification(spark, tmp_path):
    t = _mk(spark, tmp_path, write_mode="mor")
    _apply(t, _batch(spark, [("a", 1, "hi", 1, "U"), ("b", 1, "yo", 2, "U")]), "b1")
    snap_a = t.snapshot_id()
    _apply(
        t,
        _batch(
            spark,
            [
                ("a", 1, "hi2", 10, "U"),  # update
                ("b", 1, None, 11, "D"),  # delete
                ("c", 9, "new", 12, "U"),  # insert
            ],
        ),
        "b2",
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["_change_type"], r["text"])
        for r in t.read_changes(snap_a).collect()
    }
    assert got == {
        ("a", 1): ("update", "hi2"),
        ("b", 1): ("delete", "yo"),  # before-image for deletes
        ("c", 9): ("insert", "new"),
    }
    # tag names resolve as interval endpoints (audit workflows diff tags)
    t.tag("audited", snap_a)
    got_by_tag = {
        (r["conv_id"], r["turn_idx"]): r["_change_type"]
        for r in t.read_changes("audited").collect()
    }
    assert got_by_tag == {k: v[0] for k, v in got.items()}


def test_compaction_only_interval_is_empty_and_same_snapshot(spark, tmp_path):
    t = _mk(spark, tmp_path, write_mode="mor", compact_delta_files=1)
    _apply(t, _batch(spark, [("a", 1, "x", 1, "U"), ("b", 2, "y", 2, "U")]), "b1")
    _apply(t, _batch(spark, [("a", 1, "x2", 3, "U")]), "b2")
    snap_a = t.snapshot_id()
    t.compact()  # rewrites files, zero state change
    assert t.snapshot_id() > snap_a
    assert t.read_changes(snap_a).count() == 0
    assert t.read_changes(snap_a, snap_a).count() == 0


def test_bucket_pruning_reads_only_touched_buckets(spark, tmp_path):
    t = _mk(spark, tmp_path, write_mode="mor")
    rows = [(f"c{i}", 1, "v", i + 1, "U") for i in range(40)]
    _apply(t, _batch(spark, rows), "b1")
    snap_a = t.snapshot_id()
    _apply(t, _batch(spark, [("c0", 1, "v2", 100, "U")]), "b2")
    m_a, m_b = t.manifest_at(snap_a), t.current_manifest()
    changed = t._changed_buckets(m_a, m_b)
    # one key was touched -> exactly its bucket changed, not all 4
    assert len(changed) == 1
    ch = t.read_changes(snap_a).collect()
    assert [(r["conv_id"], r["_change_type"], r["text"]) for r in ch] == [
        ("c0", "update", "v2")
    ]


def test_schema_evolution_across_interval_is_not_delete_insert(spark, tmp_path):
    from pentaho_kettle_spark.cdc.replay import apply_batch

    t = _mk(spark, tmp_path, write_mode="mor")
    _apply(t, _batch(spark, [("a", 1, "hello", 1, "U")]), "b1")
    snap_a = t.snapshot_id()
    # rename text->body and add tool; only key "a" gets a new row
    b2 = (
        _batch(spark, [("a", 1, "hello", 5, "U")])
        .withColumnRenamed("text", "body")
        .withColumn("tool", F.lit("bash"))
    )
    apply_batch(t, b2, batch_id="b2", rename_hints={"text": "body"})
    ch = t.read_changes(snap_a).collect()
    # same body value under the new name, tool added -> ONE update (the
    # old file was reconciled by field id, not treated as a delete)
    assert len(ch) == 1
    r = ch[0]
    assert (r["_change_type"], r["body"], r["tool"]) == ("update", "hello", "bash")


def test_changes_then_reverse_raises(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply(t, _batch(spark, [("a", 1, "x", 1, "U")]), "b1")
    snap_b = t.snapshot_id()
    import pytest

    with pytest.raises(ValueError):
        t.read_changes(snap_b, 0)


# --- read(lww_after=...): footer-stat file pruning -------------------------
# Iceberg-analog min/max file skipping: _write_buckets records each file's
# (lww_min, lww_max) from parquet footer statistics; read(lww_after=t) skips
# files whose entire lww range is <= t, then post-filters the collapsed
# winners to lww > t. Sound because any row with lww > t lives in a file
# with lww_max > t (never pruned); pruned rows are either collapse losers
# or winners the post-filter would drop.


def _cut(s):
    import datetime as dt

    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def test_lww_after_matches_full_scan_filter(spark, tmp_path):
    t = _mk(spark, tmp_path, write_mode="mor")
    _apply(t, _batch(spark, [("a", 1, "old-a", 1, "U"), ("b", 1, "old-b", 2, "U"),
                             ("c", 1, "old-c", 3, "U")]), "b1")
    _apply(t, _batch(spark, [("a", 1, "new-a", 100, "U"), ("d", 1, "new-d", 101, "U"),
                             ("b", 1, None, 102, "D")]), "b2")
    cut = _cut(50)
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in t.read(lww_after=cut).collect()
    )
    # winners newer than the cut, tombstones excluded: a (updated), d (new);
    # b deleted; c's winner is old -> dropped by the post-filter
    assert got == [("a", 1, "new-a"), ("d", 1, "new-d")]
    full = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.read().filter(F.col("ts") > F.lit(cut)).collect()
    )
    assert got == full


def test_lww_after_prunes_time_disjoint_files(spark, tmp_path):
    t = _mk(spark, tmp_path, write_mode="mor")
    _apply(t, _batch(spark, [(f"k{i}", 1, "old", i, "U") for i in range(8)]), "b1")
    _apply(t, _batch(spark, [(f"k{i}", 1, "new", 200 + i, "U") for i in range(0, 8, 2)]),
           "b2")
    cut = _cut(100)
    rows = t.read(lww_after=cut).collect()
    assert sorted(r["conv_id"] for r in rows) == ["k0", "k2", "k4", "k6"]
    scan = t.last_scan
    # every batch-1 file has lww_max <= cut -> skipped from the scan entirely
    assert scan["files_pruned"] >= 1
    assert scan["files_total"] > scan["files_pruned"]
    # threshold below all data prunes nothing and returns every live key
    t.read(lww_after=_cut(0)).collect()
    assert t.last_scan["files_pruned"] == 0


def test_lww_after_late_arriving_loser_pruned_safely(spark, tmp_path):
    t = _mk(spark, tmp_path, write_mode="mor")
    _apply(t, _batch(spark, [("a", 1, "winner", 300, "U")]), "b1")
    # late delta carries only STALE events (ts 5 < winner's 300): the whole
    # delta file is prunable at cut=100, and dropping it must not change
    # the collapse (its rows are LWW losers)
    _apply(t, _batch(spark, [("a", 1, "stale", 5, "U")]), "b2")
    got = t.read(lww_after=_cut(100)).collect()
    assert [(r["conv_id"], r["text"]) for r in got] == [("a", "winner")]
    assert t.last_scan["files_pruned"] >= 1


def test_follow_tails_commits(spark, tmp_path):
    """follow() yields one bucket-pruned changes batch per table advance
    and resumes from a checkpointed snapshot id."""
    from pentaho_kettle_spark.cdc.incremental import follow

    t = _mk(spark, tmp_path, write_mode="mor", compact_delta_files=None)
    tail = follow(t, poll_interval=0.05, max_polls=50)
    seen = []
    _apply(t, _batch(spark, [("c1", 0, "a", 1, "U")]), "f1")
    a, b, df = next(tail)
    seen.append((a, b, {(r.conv_id, r._change_type) for r in df.collect()}))
    _apply(t, _batch(spark, [
        ("c1", 0, "a2", 2, "U"),
        ("c2", 0, "b", 3, "U"),
    ]), "f2")
    a2, b2, df2 = next(tail)
    seen.append((a2, b2, {(r.conv_id, r._change_type) for r in df2.collect()}))
    assert seen[0][2] == {("c1", "insert")}
    assert seen[1][2] == {("c1", "update"), ("c2", "insert")}
    assert seen[0][1] == seen[1][0]  # contiguous offsets
    # resume from checkpointed offset replays the second interval
    tail2 = follow(t, from_snapshot_id=seen[0][1], poll_interval=0.05, max_polls=5)
    _, _, df3 = next(tail2)
    assert {(r.conv_id, r._change_type) for r in df3.collect()} == seen[1][2]
