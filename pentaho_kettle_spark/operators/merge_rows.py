"""Merge Rows (diff) + Table Compare — snapshot diffing → change flags.

Reference: mergerows/MergeRows.java (SURVEY §2.3): compare a *reference*
stream against a *compare* stream on keys, emit every row flagged
{identical, changed, new, deleted}. This is the change-DETECTION half of
Kettle's CDC story (Synchronize After Merge applies the flags — our
tableio.merge_apply). The sorted-input requirement is gone: a full outer
join + row-hash comparison gives the same flags in one shuffle, and the
hash comparison (xxhash64 over value columns) avoids materializing both
row payloads through the comparator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_hash(prefix: str, cols: list[str]):
    return F.xxhash64(*[F.col(f"{prefix}.{c}") for c in cols])


def merge_rows_diff(
    reference: DataFrame,
    compare: DataFrame,
    keys: list[str],
    value_cols: list[str] | None = None,
    flag_field: str = "flagfield",
) -> DataFrame:
    """Rows keyed like `compare` (the new state) flagged vs `reference` (the
    old state): new (only in compare), deleted (only in reference, payload
    from reference), changed (both, values differ), identical.

    Output columns: keys + value_cols + flag_field.
    """
    value_cols = value_cols or [c for c in compare.columns if c not in keys]
    r = reference.alias("r")
    c = compare.alias("c")
    joined = r.join(c, on=[F.col(f"r.{k}") == F.col(f"c.{k}") for k in keys], how="full_outer")
    in_r = F.col(f"r.{keys[0]}").isNotNull()
    in_c = F.col(f"c.{keys[0]}").isNotNull()
    flag = (
        F.when(in_c & ~in_r, "new")
        .when(in_r & ~in_c, "deleted")
        .when(_row_hash("r", value_cols) == _row_hash("c", value_cols), "identical")
        .otherwise("changed")
    )
    out_keys = [F.coalesce(F.col(f"c.{k}"), F.col(f"r.{k}")).alias(k) for k in keys]
    out_vals = [
        F.when(in_c, F.col(f"c.{v}")).otherwise(F.col(f"r.{v}")).alias(v) for v in value_cols
    ]
    return joined.select(*out_keys, *out_vals, flag.alias(flag_field))


def diff_to_changelog(
    diff: DataFrame,
    flag_field: str = "flagfield",
    ts_col: str = "ts",
) -> DataFrame:
    """Bridge Merge Rows output to the CDC changelog op column:
    new→I, changed→U, deleted→D, identical dropped — exactly what
    Synchronize After Merge consumed (synchronizeaftermerge/
    SynchronizeAfterMerge.java reads the flag field to route its
    INSERT/UPDATE/DELETE batches)."""
    return (
        diff.filter(F.col(flag_field) != "identical")
        .withColumn(
            "op",
            F.when(F.col(flag_field) == "new", "I")
            .when(F.col(flag_field) == "changed", "U")
            .otherwise("D"),
        )
        .drop(flag_field)
    )


def table_compare(
    left: DataFrame, right: DataFrame, keys: list[str], value_cols: list[str] | None = None
) -> DataFrame:
    """tablecompare/TableCompare.java: same as merge_rows_diff but reporting
    only the non-identical rows (the error/diff stream)."""
    d = merge_rows_diff(left, right, keys, value_cols)
    return d.filter(F.col("flagfield") != "identical")
