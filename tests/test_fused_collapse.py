"""Fused bucket-aligned collapse: identical results to the key-partitioned
collapse, with the single-exchange plan the design claims."""

from __future__ import annotations

from pyspark.sql import functions as F

from pentaho_kettle_spark.cdc.changelog import CHANGELOG_SCHEMA
from pentaho_kettle_spark.cdc.lww import (
    lww_collapse,
    lww_collapse_bucketed,
)
from pentaho_kettle_spark.fixtures import gen_changelog


def _n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def _rows(df, key=("conv_id", "turn_idx")):
    cols = sorted(c for c in df.columns if c != "_bucket")
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_fused_equals_unfused(spark):
    pdf = gen_changelog(4000, 150, seed=3)
    log = spark.createDataFrame(pdf, schema=CHANGELOG_SCHEMA).drop("ingest_ts")
    base = lww_collapse(log)
    fused = lww_collapse_bucketed(log, n_buckets=8)
    assert _rows(base) == _rows(fused)
    # bucket column matches the table layout hash
    chk = fused.withColumn(
        "_expect", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(8)).cast("int")
    )
    assert chk.filter(F.col("_bucket") != F.col("_expect")).isEmpty()


def test_fused_salted_equals_unfused(spark):
    pdf = gen_changelog(4000, 50, seed=4, zipf_a=1.4)  # skewed: salts do work
    log = spark.createDataFrame(pdf, schema=CHANGELOG_SCHEMA).drop("ingest_ts")
    base = lww_collapse(log)
    hot = [tuple(r) for r in pdf[["conv_id", "turn_idx"]].drop_duplicates().head(5).itertuples(index=False)]
    fused = lww_collapse_bucketed(log, n_buckets=8, n_salts=4, hot_keys=hot)
    assert _rows(base) == _rows(fused)


def test_fused_plan_single_exchange(spark):
    pdf = gen_changelog(1000, 50, seed=5)
    log = spark.createDataFrame(pdf, schema=CHANGELOG_SCHEMA).drop("ingest_ts")
    assert _n_exchanges(lww_collapse_bucketed(log, n_buckets=8)) == 1
    # salted variant: raw exchange on (bucket, salt) + tiny reduce on bucket
    assert (
        _n_exchanges(lww_collapse_bucketed(log, n_buckets=8, n_salts=4)) == 2
    )
    # the unfused pipeline this replaces: collapse exchange + write restage
    unfused = lww_collapse(log).withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(8)).cast("int")
    ).repartition("_bucket")
    assert _n_exchanges(unfused) == 2
