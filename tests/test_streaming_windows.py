"""Event-time windows on a stream match the same aggregation run as batch —
watermark + tumbling window + session window (capabilities absent from the
reference's processing-time-only streaming, SURVEY §2.8)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pentaho_kettle_spark.streaming.windows import session_window_agg, tumbling_window_agg

SF = "/root/testdata/sf0.001"


def test_tumbling_window_stream_equals_batch(spark, tmp_path):
    import shutil

    batch = spark.read.parquet(f"{SF}/events.parquet")
    # the file stream source wants a directory; stage the table into one
    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "events.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    agg = tumbling_window_agg(
        stream, "ts", "1 hour", ["event_type"],
        {"n": "count(1)", "v": "round(sum(value), 2)"},
        watermark="1 minute",
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("win_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_start, r.event_type): (r.n, r.v)
        for r in spark.sql("select * from win_out").collect()
    }
    want_df = (
        batch.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    want = {(r.win.start, r.event_type): (r.n, r.v) for r in want_df.collect()}
    assert got == want and len(got) > 5


def test_session_window_batch_mode(spark):
    df = spark.createDataFrame(
        [("u", "2026-01-01 00:00:00"), ("u", "2026-01-01 00:03:00"),
         ("u", "2026-01-01 01:00:00")],
        "k string, s string",
    ).withColumn("ts", F.col("s").cast("timestamp"))
    out = session_window_agg(df, "ts", "5 minutes", ["k"], {"n": "count(1)"})
    rows = sorted(out.collect(), key=lambda r: r.session_start)
    assert [r.n for r in rows] == [2, 1]  # two sessions: gap > 5 min splits
