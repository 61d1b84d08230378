"""Pivot / unpivot / flatten / switch-case routing (SURVEY §2.6, §2.2).

Reference kernels: denormaliser/Denormaliser.java (pivot w/ per-target
aggregation), normaliser/Normaliser.java (unpivot), flattener/Flattener.java,
switchcase/SwitchCase.java, stepmetastructure/StepMetastructure.java.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def denormaliser(
    df: DataFrame,
    group_fields: list[str],
    key_field: str,
    targets: list[dict],
) -> DataFrame:
    """Pivot: key-field values become columns with per-target aggregation.

    targets: [{"key_value", "value_field", "out", "agg": sum|min|max|avg|
    count|first|last|concat}]. Passing explicit key values (Kettle requires
    them in the dialog) lets Spark skip the extra distinct-values job AND
    keeps the output schema static — important at scale.
    """
    fns = {
        "sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg,
        "count": F.count, "first": lambda c: F.first(c, ignorenulls=True),
        "last": lambda c: F.last(c, ignorenulls=True),
        "concat": lambda c: F.array_join(F.array_sort(F.collect_list(c.cast("string"))), ","),
    }
    exprs = []
    for t in targets:
        v = F.when(F.col(key_field) == t["key_value"], F.col(t["value_field"]))
        exprs.append(fns[t.get("agg", "first")](v).alias(t["out"]))
    return df.groupBy(*group_fields).agg(*exprs)


def normaliser(
    df: DataFrame,
    keep_fields: list[str],
    mapping: list[tuple[str, str]],
    type_field: str = "type",
    value_field: str = "value",
) -> DataFrame:
    """Unpivot: mapping [(source_col, type_label)] → (type, value) rows.
    Spark-native `unpivot` (melt) — one narrow Expand, no shuffle."""
    cols = [c for c, _ in mapping]
    labels = {c: lbl for c, lbl in mapping}
    out = df.unpivot(keep_fields, cols, type_field, value_field)
    mapping_expr = F.create_map(*[x for c in cols for x in (F.lit(c), F.lit(labels[c]))])
    return out.withColumn(type_field, mapping_expr[F.col(type_field)])


def flattener(
    df: DataFrame,
    flatten_field: str,
    group_fields: list[str],
    order_by: list[str],
    n: int,
    out_prefix: str | None = None,
) -> DataFrame:
    """Flatten N consecutive rows (per group, in order) into N columns."""
    pairs = F.array_sort(
        F.collect_list(F.struct(*[F.col(c) for c in order_by], F.col(flatten_field).alias("_v")))
    )
    agg = df.groupBy(*group_fields).agg(pairs.alias("_p"))
    prefix = out_prefix or flatten_field
    cols = [F.col(c) for c in group_fields]
    cols += [F.col("_p").getItem(i).getField("_v").alias(f"{prefix}_{i + 1}") for i in range(n)]
    return agg.select(*cols)


def switch_case(
    df: DataFrame,
    field: str,
    cases: dict,
    contains: bool = False,
) -> dict[str, DataFrame]:
    """N-way routing on a field value → {target_name: DataFrame}, plus
    'default' for non-matches. Each branch is an independent filter over the
    same scan (Catalyst reuses the exchange under AQE); at write time prefer
    partitionBy on a tag column instead of N jobs."""
    c = F.col(field)
    # several case values may route to the SAME target (Kettle allows it) —
    # group conditions per target and OR them, never overwrite
    per_target: dict[str, object] = {}
    matched = None
    for value, name in cases.items():
        cond = c.contains(value) if contains else (c == F.lit(value))
        per_target[name] = cond if name not in per_target else (per_target[name] | cond)
        matched = cond if matched is None else (matched | cond)
    outs: dict[str, DataFrame] = {
        name: df.filter(cond) for name, cond in per_target.items()
    }
    outs["default"] = df.filter(~F.coalesce(matched, F.lit(False)))
    return outs


def switch_case_tag(
    df: DataFrame, field: str, cases: dict, default: str = "default", out_field: str = "_route",
    contains: bool = False,
) -> DataFrame:
    """Single-pass variant: tag each row with its route (for partitionBy
    writes) instead of materializing N branches."""
    c = F.col(field)
    expr = None
    for value, name in cases.items():
        cond = c.contains(value) if contains else (c == F.lit(value))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_field, expr.otherwise(default))


def metadata_structure(df: DataFrame) -> DataFrame:
    """Emit the stream's schema as rows (stepmetastructure/)."""
    rows = [
        (i + 1, f.name, f.dataType.simpleString(), f.nullable)
        for i, f in enumerate(df.schema.fields)
    ]
    return df.sparkSession.createDataFrame(
        rows, "position int, fieldname string, type string, nullable boolean"
    )
