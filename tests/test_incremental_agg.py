"""Incremental aggregate maintenance (cdc/incremental.py): the aggregate
table tracks count/sum per group from the base table's CDF changes feed,
matching a from-scratch recompute after every sync."""

import datetime as dt

import pyspark.sql.types as T
from pyspark.sql import functions as F

from pentaho_kettle_spark.cdc.incremental import IncrementalAggregate
from pentaho_kettle_spark.cdc.replay import apply_batch
from pentaho_kettle_spark.tableio.parquet_snapshot import ParquetSnapshotTableIO

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _mk(spark, tmp_path):
    t = ParquetSnapshotTableIO(
        spark,
        str(tmp_path / "base"),
        key_cols=("conv_id", "turn_idx"),
        lww_col="ts",
        n_buckets=4,
        write_mode="mor",
    )
    t.init_empty(SCHEMA)
    return t


def _batch(spark, rows):
    base = dt.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [
            (c, i, r, v, base + dt.timedelta(seconds=s), s, op)
            for (c, i, r, v, s, op) in rows
        ],
        "conv_id string, turn_idx int, role string, score double, "
        "ts timestamp, seq long, op string",
    )


def _recompute(base):
    return {
        (r["role"],): (r["cnt"], r["s"])
        for r in base.read()
        .groupBy("role")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("score").alias("s"))
        .collect()
    }


def _agg_state(agg):
    return {
        (r["role"],): (r["cnt"], r["sum_score"]) for r in agg.read().collect()
    }


def test_sync_matches_recompute_across_batches(spark, tmp_path):
    base = _mk(spark, tmp_path)
    agg = IncrementalAggregate(
        spark, str(tmp_path / "agg"), base, ["role"], ["score"], n_buckets=2
    )
    apply_batch(
        base,
        _batch(
            spark,
            [
                ("a", 1, "user", 1.5, 1, "U"),
                ("a", 2, "assistant", 2.0, 2, "U"),
                ("b", 1, "user", 3.0, 3, "U"),
            ],
        ),
        batch_id="b1",
    )
    agg.sync()
    assert _agg_state(agg) == _recompute(base)
    # update (score change), delete, insert — all in one interval
    apply_batch(
        base,
        _batch(
            spark,
            [
                ("a", 1, "user", 9.5, 10, "U"),  # update score 1.5 -> 9.5
                ("b", 1, None, None, 11, "D"),  # delete a user row
                ("c", 1, "tool", 4.0, 12, "U"),  # new group
            ],
        ),
        batch_id="b2",
    )
    agg.sync()
    state = _agg_state(agg)
    assert state == _recompute(base)
    assert state[("user",)][0] == 1  # b/1 deleted, a/1 remains


def test_group_migration_moves_contribution(spark, tmp_path):
    base = _mk(spark, tmp_path)
    agg = IncrementalAggregate(
        spark, str(tmp_path / "agg"), base, ["role"], ["score"], n_buckets=2
    )
    apply_batch(
        base, _batch(spark, [("a", 1, "user", 5.0, 1, "U")]), batch_id="b1"
    )
    agg.sync()
    # the same key flips role: preimage retracts from 'user', postimage
    # lands in 'assistant'; 'user' count hits zero and leaves the table
    apply_batch(
        base, _batch(spark, [("a", 1, "assistant", 5.0, 2, "U")]), batch_id="b2"
    )
    agg.sync()
    assert _agg_state(agg) == {("assistant",): (1, 5.0)}


def test_sync_is_idempotent_and_resumable(spark, tmp_path):
    base = _mk(spark, tmp_path)
    agg = IncrementalAggregate(
        spark, str(tmp_path / "agg"), base, ["role"], ["score"], n_buckets=2
    )
    apply_batch(
        base, _batch(spark, [("a", 1, "user", 5.0, 1, "U")]), batch_id="b1"
    )
    r1 = agg.sync()
    assert r1["synced_to"] == base.snapshot_id()
    snap = agg.table.snapshot_id()
    r2 = agg.sync()  # nothing new
    assert "skipped_noop_sync" in r2
    assert agg.table.snapshot_id() == snap
    # a fresh handle over the same roots resumes from the manifest
    agg2 = IncrementalAggregate(
        spark, str(tmp_path / "agg"), base, ["role"], ["score"], n_buckets=2
    )
    assert agg2.synced_to() == r1["synced_to"]
    assert _agg_state(agg2) == _recompute(base)


def test_null_values_follow_sql_sum_semantics(spark, tmp_path):
    base = _mk(spark, tmp_path)
    agg = IncrementalAggregate(
        spark, str(tmp_path / "agg"), base, ["role"], ["score"], n_buckets=2
    )
    apply_batch(
        base,
        _batch(
            spark,
            [("a", 1, "user", None, 1, "U"), ("a", 2, "user", None, 2, "U")],
        ),
        batch_id="b1",
    )
    agg.sync()
    assert _agg_state(agg) == {("user",): (2, None)}  # SUM of all-NULL is NULL
    apply_batch(
        base, _batch(spark, [("a", 3, "user", 7.0, 3, "U")]), batch_id="b2"
    )
    agg.sync()
    assert _agg_state(agg) == {("user",): (3, 7.0)}
