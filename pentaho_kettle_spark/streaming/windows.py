"""Event-time windowed aggregation over streams — the capability gap the
reference never closed (SURVEY §2.8: Kettle's streaming is processing-time
tumbling buffers only; no event time, no watermarks, no session windows).

These wrappers pin the idioms: watermark bounds state, window() for
tumbling/sliding, session_window() for gap-based sessions. They run on any
streaming DataFrame (file source in tests, Kafka in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    stream: DataFrame,
    ts_col: str,
    window_len: str,
    group_cols: list[str],
    aggs: dict[str, str],
    watermark: str = "10 minutes",
    slide: str | None = None,
) -> DataFrame:
    """aggs: {out_name: 'fn(col)'} SQL aggregate expressions."""
    # watermarks require TIMESTAMP_LTZ; parquet NTZ casts identically under UTC
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = F.window(F.col(ts_col), window_len, slide) if slide else F.window(F.col(ts_col), window_len)
    exprs = [F.expr(e).alias(n) for n, e in aggs.items()]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), *group_cols)
        .agg(*exprs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            *[F.col(n) for n in aggs],
        )
    )


def session_window_agg(
    stream: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: dict[str, str],
    watermark: str = "10 minutes",
) -> DataFrame:
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    exprs = [F.expr(e).alias(n) for n, e in aggs.items()]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), *group_cols)
        .agg(*exprs)
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            *group_cols,
            *[F.col(n) for n in aggs],
        )
    )
