"""Plan inspection helpers — the 'would this survive 100×?' feedback loop.

Used by tests to assert physical properties the operators promise: filters
pushed to the scan, broadcast joins where the contract says broadcast,
bounded shuffle counts. (The reference has no plans to inspect — the user's
step graph IS its physical plan, SURVEY §3.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _plan_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def plan_summary(df: DataFrame) -> dict:
    p = _plan_str(df)
    return {
        "shuffles": p.count("Exchange"),
        "broadcast_joins": p.count("BroadcastHashJoin"),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "wholestage_codegen": "WholeStageCodegen" in p,
        "pushed_filters": "PushedFilters: [" in p and "PushedFilters: []" not in p,
        "plan": p,
    }


def count_shuffles(df: DataFrame) -> int:
    return _plan_str(df, "simple").count("Exchange")


def pushed_filters(df: DataFrame) -> list[str]:
    out = []
    for line in _plan_str(df).splitlines():
        if "PushedFilters:" in line:
            out.append(line.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column-pruning check)."""
    import re

    p = _plan_str(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]
