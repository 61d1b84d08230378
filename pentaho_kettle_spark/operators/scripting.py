"""Scripting / UDF / UDTF surface (SURVEY §2.7) — the vectorized-only policy.

Reference kernels: scriptvalues_mod/ScriptValuesMod.java (per-row JS, can
emit 0..N rows), userdefinedjavaclass/UserDefinedJavaClass.java (full custom
step), janino/Janino.java (compiled scalar expression), formula/Formula.java.

Policy (BASELINE.json#input_hint): no per-row Python anywhere. The three
rewrite targets, fastest first:
  1. `expr()` SQL expression — stays fully JVM-side (Janino/Formula land).
  2. scalar `pandas_udf` — Arrow-batched columnar Python (JS scalar land).
  3. `mapInPandas` / `applyInPandas` — 0..N-rows-out / grouped custom steps
     (ScriptValuesMod putRow loops, UserDefinedJavaClass).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def janino_expression(df: DataFrame, out_field: str, sql_expr: str) -> DataFrame:
    """User-defined Java expression → SQL expression (zero Python)."""
    return df.withColumn(out_field, F.expr(sql_expr))


def formula(df: DataFrame, out_field: str, formula_str: str) -> DataFrame:
    """Formula step — real OpenFormula syntax (formula/Formula.java embeds
    libformula): `[fieldname]` bracket refs, `&` concat, `IF/LEFT/MID/...`
    compile to native Catalyst via plans/openformula.py. A string the
    OpenFormula subset can't express falls back to Spark SQL `expr()` when
    it carries no bracket refs (the pre-existing passthrough extension);
    authentic-OpenFormula failures raise naming the construct."""
    from pentaho_kettle_spark.plans.openformula import compile_formula

    try:
        return df.withColumn(out_field, compile_formula(formula_str))
    except NotImplementedError:
        if "[" in formula_str:
            raise
        return janino_expression(df, out_field, formula_str)


def script_values(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: str | T.StructType,
    batch_hint: int | None = None,
) -> DataFrame:
    """Modified JavaScript Value / UserDefinedJavaClass replacement: a
    0..N-rows-out transform as mapInPandas. `fn` receives Arrow batches of
    the input and yields output batches — the engine-level contract is the
    same as processRow over the whole batch instead of one row."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = fn(b)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(_gen, output_schema)


def grouped_transform(
    df: DataFrame,
    group_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: str | T.StructType,
) -> DataFrame:
    """Trans Executor 'per row-group sub-transformation'
    (transexecutor/TransExecutor.java): run fn once per key group."""
    return df.groupBy(*group_cols).applyInPandas(lambda pdf: fn(pdf), output_schema)


def execute_sql(spark, sql: str) -> DataFrame:
    """Execute SQL script (sql/ExecSQL.java) — driver-side spark.sql."""
    return spark.sql(sql)
