"""Group By / Memory Group By — every Kettle aggregate type (SURVEY §2.4).

Reference: groupby/GroupBy.java (sort-agg, cumulative modes) and
memgroupby/MemoryGroupBy.java (hash-agg). In Spark both collapse to one
`groupBy().agg()` — Catalyst picks hash-agg with map-side partial
aggregation and spills when needed, so the sorted-input requirement and the
RAM ceiling of the reference both disappear.

Order-sensitive aggregates (FIRST/LAST/CONCAT) are pinned with an explicit
`order_by` — Kettle inherited arrival order from the stream; Spark has no
arrival order, so the caller must name one (min_by/max_by/sorted collect —
still single-shuffle, no window pass).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class Agg:
    field: str  # subject column ('*' for COUNT_ALL)
    type: str  # Kettle TYPE_GROUP_* name, see AGG_TYPES
    out: str  # result column name
    separator: str = ","  # for CONCAT_STRING
    percentile: float = 0.5


def _ord_struct(order_by: list[str] | None) -> Column:
    return F.struct(*[F.col(c) for c in (order_by or [])])


def _build(a: Agg, order_by: list[str] | None) -> Column:
    c = F.col(a.field) if a.field != "*" else None
    t = a.type.upper()
    if t == "SUM":
        return F.sum(c)
    if t in ("AVERAGE", "MEAN", "AVG"):
        return F.avg(c)
    if t == "MEDIAN":
        return F.median(c)
    if t == "PERCENTILE":
        return F.percentile(c, F.lit(a.percentile))
    if t == "PERCENTILE_APPROX":
        return F.percentile_approx(c, F.lit(a.percentile))
    if t == "MIN":
        return F.min(c)
    if t == "MAX":
        return F.max(c)
    if t == "COUNT_ALL":
        return F.count(F.lit(1))
    if t == "COUNT_ANY":
        return F.count(c)
    if t == "COUNT_DISTINCT":
        return F.count_distinct(c)
    if t == "APPROX_COUNT_DISTINCT":
        return F.approx_count_distinct(c)
    if t in ("STANDARD_DEVIATION", "STDDEV"):
        return F.stddev_samp(c)
    if t == "STANDARD_DEVIATION_POP":
        return F.stddev_pop(c)
    if t == "VARIANCE":
        return F.var_samp(c)
    ordk = _ord_struct(order_by)
    if t == "FIRST":  # first non-null in order
        return F.min_by(c, F.when(c.isNotNull(), ordk))
    if t == "LAST":
        return F.max_by(c, F.when(c.isNotNull(), ordk))
    if t == "FIRST_INCL_NULL":
        return F.min_by(c, ordk)
    if t == "LAST_INCL_NULL":
        return F.max_by(c, ordk)
    if t in ("CONCAT_COMMA", "CONCAT_STRING"):
        sep = "," if t == "CONCAT_COMMA" else a.separator
        # order pinned: collect (ord, val) pairs, sort by ord, project val
        pairs = F.array_sort(F.collect_list(F.struct(ordk.alias("o"), c.alias("v"))))
        return F.array_join(F.transform(pairs, lambda p: p["v"].cast("string")), sep)
    raise ValueError(f"unknown aggregate type {a.type}")


def group_by(
    df: DataFrame,
    keys: list[str],
    aggs: list[Agg | dict],
    order_by: list[str] | None = None,
) -> DataFrame:
    aggs = [Agg(**a) if isinstance(a, dict) else a for a in aggs]
    exprs = [_build(a, order_by).alias(a.out) for a in aggs]
    return df.groupBy(*keys).agg(*exprs)


def group_by_include_all_rows(
    df: DataFrame,
    keys: list[str],
    aggs: list[Agg | dict],
    order_by: list[str],
    cumulative: bool = False,
) -> DataFrame:
    """Kettle "include all rows" mode: every input row passes through with the
    aggregate appended; `cumulative` gives running sum/avg up to the current
    row (GroupBy.java cumulative sum/average flags)."""
    aggs = [Agg(**a) if isinstance(a, dict) else a for a in aggs]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    if cumulative:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    else:
        w = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    for a in aggs:
        df = df.withColumn(a.out, _build(a, order_by).over(w) if not _is_orderless(a) else _simple_over(a, w))
    return df


def _is_orderless(a: Agg) -> bool:
    return a.type.upper() in ("SUM", "AVERAGE", "MEAN", "AVG", "MIN", "MAX", "COUNT_ALL", "COUNT_ANY")


def _simple_over(a: Agg, w) -> Column:
    c = F.col(a.field) if a.field != "*" else F.lit(1)
    t = a.type.upper()
    m = {
        "SUM": F.sum,
        "AVERAGE": F.avg,
        "MEAN": F.avg,
        "AVG": F.avg,
        "MIN": F.min,
        "MAX": F.max,
        "COUNT_ALL": F.count,
        "COUNT_ANY": F.count,
    }
    return m[t](c).over(w)


def univariate_stats(df: DataFrame, fields: list[str]) -> DataFrame:
    """univariatestats/UnivariateStats.java: N, mean, stddev, min, max,
    median per field — one pass, one row out."""
    exprs = []
    for f in fields:
        c = F.col(f)
        exprs += [
            F.count(c).alias(f"{f}_n"),
            F.avg(c).alias(f"{f}_mean"),
            F.stddev_samp(c).alias(f"{f}_stddev"),
            F.min(c).alias(f"{f}_min"),
            F.max(c).alias(f"{f}_max"),
            F.median(c).alias(f"{f}_median"),
        ]
    return df.agg(*exprs)
