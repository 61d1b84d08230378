"""Scripting surface (SURVEY §2.7): 0..N-rows-out mapInPandas transforms,
grouped applyInPandas, SQL-expression scalars — the vectorized rewrites of
ScriptValuesMod / UserDefinedJavaClass / Janino."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from pentaho_kettle_spark.operators.scripting import (
    grouped_transform,
    janino_expression,
    script_values,
)


def test_script_values_zero_to_n_rows(spark):
    """A 'script' that drops even ids and duplicates odd ids — the putRow
    0..N contract of ScriptValuesMod."""
    df = spark.createDataFrame([(i,) for i in range(6)], "id int")

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        odd = b[b["id"] % 2 == 1]
        return pd.concat([odd, odd.assign(id=odd["id"] + 100)])

    out = script_values(df, fn, "id int")
    assert sorted(r.id for r in out.collect()) == [1, 3, 5, 101, 103, 105]


def test_grouped_transform(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "k string, v double"
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["v"] = pdf["v"] - pdf["v"].mean()
        return pdf

    out = grouped_transform(df, ["k"], center, "k string, v double")
    got = sorted((r.k, r.v) for r in out.collect())
    assert got == [("a", -1.0), ("a", 1.0), ("b", 0.0)]


def test_janino_expression(spark):
    df = spark.createDataFrame([(3, 4)], "a int, b int")
    out = janino_expression(df, "hyp", "sqrt(a*a + b*b)")
    assert out.collect()[0].hyp == 5.0
