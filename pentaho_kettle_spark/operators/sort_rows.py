"""Sorts / limits / ordered unions / set ops (SURVEY §2.5).

Reference kernels: sort/SortRows.java (external merge sort w/ gzip spill →
Spark's ExternalSorter does this natively), sortedmerge/SortedMerge.java,
append/Append.java, prioritizestreams/PrioritizeStreams.java,
blockingstep/BlockingStep.java. Set ops (intersect/except) have no Kettle
step — users composed them via lookups; we expose Spark's directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sort_rows(
    df: DataFrame,
    keys: list[tuple[str, bool]] | list[str],
    case_insensitive: bool = False,
    unique_only: bool = False,
) -> DataFrame:
    """keys: [(field, ascending)] or [field] (ascending). Distributed range-
    partitioned sort (no single-node spill bottleneck)."""
    norm = [(k, True) if isinstance(k, str) else k for k in keys]
    cols = []
    for name, asc in norm:
        c = F.col(name)
        if case_insensitive:
            c = F.lower(c)
        cols.append(c.asc() if asc else c.desc())
    if unique_only:
        df = df.dropDuplicates([k for k, _ in norm])
    return df.orderBy(*cols)


def top_k(df: DataFrame, keys: list[tuple[str, bool]], k: int) -> DataFrame:
    """Sort + Sample composition in Kettle; here a single
    TakeOrderedAndProject (no full sort at scale)."""
    cols = [F.col(n).asc() if asc else F.col(n).desc() for n, asc in keys]
    return df.orderBy(*cols).limit(k)


def append_streams(head: DataFrame, tail: DataFrame, order_field: str | None = None) -> DataFrame:
    """Ordered concat: all of head, then tail. Spark unions are unordered, so
    the order is materialized as a priority column the caller can sort by
    (or drop if order is irrelevant downstream) — documented deviation."""
    h = head.withColumn("_stream_order", F.lit(0))
    t = tail.withColumn("_stream_order", F.lit(1))
    out = h.unionByName(t)
    if order_field:
        return out.withColumnRenamed("_stream_order", order_field)
    return out.drop("_stream_order")


def prioritize_streams(streams: list[DataFrame], order_field: str | None = None) -> DataFrame:
    out = None
    for i, s in enumerate(streams):
        s = s.withColumn("_stream_order", F.lit(i))
        out = s if out is None else out.unionByName(s)
    if order_field:
        return out.withColumnRenamed("_stream_order", order_field)
    return out.drop("_stream_order")


def sorted_merge(streams: list[DataFrame], keys: list[str]) -> DataFrame:
    """k-way merge of sorted streams = union + re-sort (Catalyst has no
    merge-preserving union; the range-partitioned sort is equivalent)."""
    out = streams[0]
    for s in streams[1:]:
        out = out.unionByName(s)
    return out.orderBy(*keys)


def blocking_step(df: DataFrame, pass_all: bool = True, order_by: list[str] | None = None) -> DataFrame:
    """BlockingStep: buffer all rows until upstream finishes. In a lazy DAG a
    barrier is an action boundary; for the pass-last-row mode we keep the last
    row under an explicit order."""
    if pass_all:
        return df  # barrier is implicit at the next action
    w = [F.col(c).desc() for c in (order_by or df.columns)]
    return df.orderBy(*w).limit(1)


def detect_empty_stream(df: DataFrame) -> DataFrame:
    """detectemptystream/: emit one all-null row if input is empty."""
    spark = df.sparkSession
    if df.isEmpty():
        return spark.createDataFrame([tuple(None for _ in df.columns)], df.schema)
    return df


def unique_rows(
    df: DataFrame,
    keys: list[str],
    count_field: str | None = None,
    order_by: list[str] | None = None,
    emit_duplicates: bool = False,
):
    """uniquerows/UniqueRows.java + uniquerowsbyhashset/ — dedupe on keys.
    With count_field: number of occurrences per kept row. With
    emit_duplicates: also return the duplicate rows (error stream).
    Winner is pinned by order_by (Kettle kept the first arrival)."""
    if count_field is None and not emit_duplicates:
        payload = [c for c in df.columns if c not in keys]
        if order_by is None or not payload:
            return df.dropDuplicates(keys)
        # order_by given → the winner is PINNED: min_by over the order
        # struct, one aggregate with map-side partials — not dropDuplicates,
        # which keeps an arbitrary row and only happened to match the pinned
        # oracle while the input arrived in one deterministic partition
        # (r6 hardening: any re-partitioning upstream would have made the
        # kept rows run-dependent).
        from pentaho_kettle_spark.plans.spread import spread_if_narrow

        ordk = F.struct(*[F.col(c) for c in order_by])
        agg = spread_if_narrow(df, keys).groupBy(*keys).agg(
            F.min_by(F.struct(*[F.col(c) for c in payload]), ordk).alias("w")
        )
        by_name = {k: F.col(k) for k in keys}
        by_name.update({c: F.col(f"w.{c}").alias(c) for c in payload})
        return agg.select(*[by_name[c] for c in df.columns])
    from pyspark.sql import Window

    ordk = [F.col(c) for c in (order_by or keys)]
    w = Window.partitionBy(*keys).orderBy(*ordk)
    wc = Window.partitionBy(*keys)
    tagged = df.withColumn("_rn", F.row_number().over(w))
    if count_field:
        tagged = tagged.withColumn(count_field, F.count(F.lit(1)).over(wc))
    kept = tagged.filter(F.col("_rn") == 1).drop("_rn")
    if emit_duplicates:
        dups = tagged.filter(F.col("_rn") > 1).drop("_rn")
        if count_field:
            dups = dups.drop(count_field)
        return kept, dups
    return kept
