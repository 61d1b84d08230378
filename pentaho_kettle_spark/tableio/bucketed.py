"""Bucketed catalog tables: co-located, shuffle-free joins and aggregations.

The snapshot table (parquet_snapshot.py) buckets DATA FILES by key hash so
merges prune; this module covers the complementary case — ANALYTICS tables
registered in the Spark catalog with `bucketBy`, so repeated joins/aggs on
the bucket key skip their shuffle entirely. At 100 TB a conv_id-bucketed
transcripts table joined to a conv_id-bucketed labels/metadata table is an
Exchange-free SortMergeJoin: the single biggest network saving available to
a recurring pipeline, paid once at write time.

Kettle parity: the reference has no notion of physical co-location — every
sorted merge join re-sorts both streams per run (mergejoin/MergeJoin.java +
two SortRows, SURVEY §2.3). Bucketing is what makes that cost one-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist df as a catalog table bucketed (and optionally sorted) by
    `bucket_cols`. Readers joining two tables with identical bucketing on
    the join key get no Exchange on either side; adding `sort_cols` equal to
    the join key removes the Sort too."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on=keys, how=how)


def plan_shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the final physical plan —
    the thing bucketing is supposed to drive to zero. AQE-aware: inspects
    the executed plan's string form."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
