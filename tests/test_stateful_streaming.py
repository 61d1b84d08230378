"""applyInPandasWithState operators: cross-batch state survives, duplicates
dropped in-stream, counters continue across micro-batches."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from pentaho_kettle_spark.streaming.stateful import (
    stateful_seq_dedup,
    stateful_turn_counter,
)


def _land(spark, root, name, rows):
    df = spark.createDataFrame(rows, "k string, seq long, v string")
    df.coalesce(1).write.mode("overwrite").parquet(f"{root}/stage_{name}")
    os.makedirs(f"{root}/src", exist_ok=True)
    for f in os.listdir(f"{root}/stage_{name}"):
        if f.endswith(".parquet"):
            shutil.copy(f"{root}/stage_{name}/{f}", f"{root}/src/{name}.parquet")


def test_stateful_seq_dedup_across_batches(spark, tmp_path):
    root = str(tmp_path)
    _land(spark, root, "b1", [("a", 1, "x"), ("a", 2, "y"), ("b", 5, "z")])
    stream = spark.readStream.schema("k string, seq long, v string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{root}/src")
    out = stateful_seq_dedup(stream, ["k"], "seq")
    q = (
        out.writeStream.outputMode("append").format("memory").queryName("dedup_out")
        .option("checkpointLocation", f"{root}/ck").start()
    )
    q.processAllAvailable()
    # batch 2: one true duplicate (a,2), one stale (b,4), one fresh (a,3)
    _land(spark, root, "b2", [("a", 2, "y"), ("b", 4, "old"), ("a", 3, "new")])
    q.processAllAvailable()
    q.stop()
    rows = sorted(
        (r.k, r.seq) for r in spark.sql("select * from dedup_out").collect()
    )
    assert rows == [("a", 1), ("a", 2), ("a", 3), ("b", 5)]


def test_stateful_turn_counter_continues(spark, tmp_path):
    root = str(tmp_path)
    _land(spark, root, "b1", [("c", 10, "t0"), ("c", 11, "t1")])
    stream = spark.readStream.schema("k string, seq long, v string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{root}/src")
    out = stateful_turn_counter(stream, ["k"])
    q = (
        out.writeStream.outputMode("append").format("memory").queryName("cnt_out")
        .option("checkpointLocation", f"{root}/ck").start()
    )
    q.processAllAvailable()
    _land(spark, root, "b2", [("c", 12, "t2")])
    q.processAllAvailable()
    q.stop()
    got = {r.seq: r.turn_count for r in spark.sql("select * from cnt_out").collect()}
    assert got == {10: 1, 11: 2, 12: 3}  # counter survived the batch boundary
