"""Analytic Query — LAG/LEAD N within a group + cumulative aggregates.

Reference: analyticquery/AnalyticQuery.java (SURVEY §2.4) — required sorted
input and buffered a sliding deque per group; Spark's window functions do it
in one pass over hash-partitioned, locally-sorted groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def analytic_query(
    df: DataFrame,
    group_fields: list[str],
    order_fields: list[str],
    specs: list[dict],
) -> DataFrame:
    """specs: [{"subject", "type": lag|lead, "n", "out"}]."""
    w = Window.partitionBy(*group_fields).orderBy(*[F.col(c) for c in order_fields])
    for s in specs:
        fn = F.lag if s["type"] == "lag" else F.lead
        df = df.withColumn(s["out"], fn(F.col(s["subject"]), s.get("n", 1)).over(w))
    return df


def cumulative(
    df: DataFrame,
    group_fields: list[str],
    order_fields: list[str],
    specs: list[dict],
) -> DataFrame:
    """Running aggregates (GroupBy.java cumulative sum/average modes).
    specs: [{"subject", "type": sum|avg|count|min|max, "out"}]."""
    w = (
        Window.partitionBy(*group_fields)
        .orderBy(*[F.col(c) for c in order_fields])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fns = {"sum": F.sum, "avg": F.avg, "count": F.count, "min": F.min, "max": F.max}
    for s in specs:
        df = df.withColumn(s["out"], fns[s["type"]](F.col(s["subject"])).over(w))
    return df


def get_previous_row_field(
    df: DataFrame, field: str, out: str, order_by: list[str], group_by: list[str] | None = None
) -> DataFrame:
    """plugins/get-previous-row-field: carry a value from the previous row."""
    w = Window.partitionBy(*(group_by or [])).orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(out, F.lag(F.col(field)).over(w))
