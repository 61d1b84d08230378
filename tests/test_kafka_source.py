"""Kafka/Debezium envelope parsing — the engine-side half of the Kafka
source, exercised on static DataFrames (no broker in the sandbox)."""

from __future__ import annotations

import datetime as dt
import json

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from pentaho_kettle_spark.cdc.changelog import CHANGELOG_SCHEMA
from pentaho_kettle_spark.sources.kafka import parse_debezium_envelope

WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def _wire(spark, envelopes):
    rows = [
        (
            b"k",
            json.dumps(e).encode() if e is not None else None,
            "transcripts.cdc",
            0,
            i,
            dt.datetime(2026, 1, 1, 0, 0, i),
        )
        for i, e in enumerate(envelopes)
    ]
    return spark.createDataFrame(rows, WIRE_SCHEMA)


def _env(op, image, lsn, ts_ms=1767225600000):
    e = {"op": op, "before": None, "after": None,
         "source": {"ts_ms": ts_ms, "lsn": lsn}, "ts_ms": ts_ms}
    if op == "d":
        e["before"] = image
    else:
        e["after"] = image
    return e


IMG = {"conv_id": "c-1", "turn_idx": 0, "role": "user",
       "text": "hello", "tool": None, "ts": "2026-01-01T00:00:01"}


def test_ops_map_and_schema(spark):
    out = parse_debezium_envelope(
        _wire(spark, [
            _env("c", IMG, 100),
            _env("r", {**IMG, "turn_idx": 1}, 101),
            _env("u", {**IMG, "turn_idx": 0, "text": "hello!"}, 102),
            _env("d", {**IMG, "turn_idx": 1}, 103),
        ])
    )
    # names + types must match the asserted engine schema (nullability can't
    # be pinned through casts; the sink's conform step enforces it)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in CHANGELOG_SCHEMA.fields
    ]
    rows = {(r.seq): r for r in out.collect()}
    assert rows[100].op == "I" and rows[101].op == "I"
    assert rows[102].op == "U" and rows[102].text == "hello!"
    assert rows[103].op == "D" and rows[103].conv_id == "c-1"


def test_delete_uses_before_image_and_connector_ts(spark):
    img = dict(IMG)
    img.pop("ts")  # keys-only delete image: no row ts
    out = parse_debezium_envelope(_wire(spark, [_env("d", img, 7, ts_ms=1767225661000)]))
    row = out.collect()[0]
    assert row.op == "D"
    # falls back to connector ts_ms for the tombstone's LWW stamp
    assert row.ts == dt.datetime(2026, 1, 1, 0, 1, 1)


def test_tombstone_and_garbage_records_dropped(spark):
    wire = _wire(spark, [_env("c", IMG, 1), None])  # None → Kafka tombstone
    garbage = spark.createDataFrame(
        [(b"k", b"not json at all", "t", 0, 99, dt.datetime(2026, 1, 1))], WIRE_SCHEMA
    )
    out = parse_debezium_envelope(wire.unionByName(garbage))
    assert out.count() == 1


def test_ingest_ts_is_kafka_record_time(spark):
    out = parse_debezium_envelope(_wire(spark, [_env("c", IMG, 1), _env("u", IMG, 2)]))
    got = [r.ingest_ts for r in out.orderBy("seq").collect()]
    assert got == [dt.datetime(2026, 1, 1, 0, 0, 0), dt.datetime(2026, 1, 1, 0, 0, 1)]


def test_parsed_stream_feeds_replay(spark, tmp_path):
    """End-to-end: wire records → parse → apply_batch → table state."""
    from pentaho_kettle_spark.cdc.replay import apply_batch
    from pentaho_kettle_spark.tableio import ParquetSnapshotTableIO

    out = parse_debezium_envelope(
        _wire(spark, [
            _env("c", IMG, 1),
            _env("u", {**IMG, "text": "edited", "ts": "2026-01-01T00:00:02"}, 2),
        ])
    )
    table = ParquetSnapshotTableIO(spark, str(tmp_path / "t"), n_buckets=4)
    table.init_empty(T.StructType(
        [f for f in CHANGELOG_SCHEMA.fields if f.name not in ("seq", "op", "ingest_ts")]
    ))
    apply_batch(table, out.drop("ingest_ts"), batch_id="kafka-0")
    rows = table.read().collect()
    assert len(rows) == 1 and rows[0].text == "edited"


def test_kafka_reader_raises_without_jar(spark):
    from pentaho_kettle_spark.sources.kafka import read_kafka_changelog_stream

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_kafka_changelog_stream(spark, "localhost:9092", "t")
