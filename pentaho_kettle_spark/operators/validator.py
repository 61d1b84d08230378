"""Data Validator — per-field rules → valid / error-row split (the DLQ).

Reference: validator/Validator.java (SURVEY §2.7) and the error-hop
machinery (BaseStep#putError, step/StepErrorMeta.java): Kettle steps can
divert failing rows to an error hop with error-description fields. Here the
same contract is a single pass that tags each row with its first failing
rule, split into (valid, errors) — errors carrying the Kettle-style
error_field/error_descriptions columns, ready for a quarantine sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rule_condition(field: str, rule: dict) -> Column:
    """True when the rule PASSES."""
    c = F.col(field)
    kind = rule["kind"]
    if kind == "not_null":
        return c.isNotNull()
    if kind == "min":
        return c.isNull() | (c >= rule["value"])
    if kind == "max":
        return c.isNull() | (c <= rule["value"])
    if kind == "regex":
        return c.isNull() | c.rlike(rule["value"])
    if kind == "in_list":
        return c.isNull() | c.isin(*rule["value"])
    if kind == "max_length":
        return c.isNull() | (F.length(c) <= rule["value"])
    if kind == "min_length":
        return c.isNull() | (F.length(c) >= rule["value"])
    raise ValueError(f"unknown rule kind {kind}")


def validator(
    df: DataFrame,
    rules: list[dict],
    error_field: str = "error_field",
    error_desc: str = "error_description",
) -> tuple[DataFrame, DataFrame]:
    """rules: [{"field", "kind", "value"?, "description"?}] →
    (valid_rows, error_rows + [error_field, error_desc])."""
    fail_field = None
    fail_desc = None
    for r in rules:
        ok = _rule_condition(r["field"], r)
        desc = r.get("description", f"{r['field']} failed {r['kind']}")
        if fail_field is None:
            fail_field = F.when(~ok, r["field"])
            fail_desc = F.when(~ok, desc)
        else:
            fail_field = fail_field.when(~ok, r["field"])
            fail_desc = fail_desc.when(~ok, desc)
    tagged = df.withColumn(error_field, fail_field).withColumn(error_desc, fail_desc)
    valid = tagged.filter(F.col(error_field).isNull()).drop(error_field, error_desc)
    errors = tagged.filter(F.col(error_field).isNotNull())
    return valid, errors
