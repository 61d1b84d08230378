"""Filter Rows — predicate tree with two-way true/false routing.

Reference: engine/.../trans/steps/filterrows/FilterRows.java and
core/.../core/Condition.java (SURVEY §2.2). Kettle semantic pin: a NULL
comparison evaluates to FALSE, so the row goes to the false target — NOT
dropped. Spark's filter(~c) would drop NULLs from both branches, so the
false branch is `~c | c.isNull()` (three-valued logic made two-valued,
exactly as Condition#evaluate does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Condition function codes (core/.../Condition.java FUNC_* constants)
_FUNCS = {
    "=": lambda c, v: c == v,
    "<>": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "IS NULL": lambda c, v: c.isNull(),
    "IS NOT NULL": lambda c, v: c.isNotNull(),
    "REGEXP": lambda c, v: c.rlike(v),
    "CONTAINS": lambda c, v: c.contains(v),
    "STARTS WITH": lambda c, v: c.startswith(v),
    "ENDS WITH": lambda c, v: c.endswith(v),
    "LIKE": lambda c, v: c.like(v),
    "IN LIST": lambda c, v: c.isin(*v),
    "BETWEEN": lambda c, v: c.between(v[0], v[1]),
}


def kettle_condition(tree: dict | str | Column) -> Column:
    """Build a Column from a Condition-style nested dict:
    {"field","function","value"} leaves combined with
    {"op": "AND"|"OR"|"NOT"|"XOR", "children":[...]}; or pass a SQL string /
    Column straight through (Java Filter / Janino equivalent)."""
    if isinstance(tree, Column):
        return tree
    if isinstance(tree, str):
        return F.expr(tree)
    if "op" in tree:
        kids = [kettle_condition(t) for t in tree["children"]]
        op = tree["op"].upper()
        if op == "NOT":
            return ~kids[0]
        out = kids[0]
        for k in kids[1:]:
            if op == "AND":
                out = out & k
            elif op == "OR":
                out = out | k
            elif op == "XOR":
                out = out != k
        return out
    fn = _FUNCS[tree.get("function", "=").upper()]
    return fn(F.col(tree["field"]), tree.get("value"))


def filter_rows(df: DataFrame, condition) -> tuple[DataFrame, DataFrame]:
    """Returns (true_target, false_target) with Kettle NULL-is-false routing."""
    c = kettle_condition(condition)
    true_df = df.filter(c)
    false_df = df.filter(~c | c.isNull())
    return true_df, false_df
