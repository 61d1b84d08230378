"""Deterministic sampling ops (functions/sampling.py): stratified quota
sample and salted train/eval split."""

from __future__ import annotations

import pyspark.sql.functions as F

from pentaho_kettle_spark.functions.sampling import (
    stratified_sample,
    train_eval_split,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
        # skewed strata: ~75% 'en', ~19% 'de', 6 tiny 'fr' rows
        F.when(F.col("id") % 67 == 0, "fr")
        .when(F.col("id") % 4 == 0, "de")
        .otherwise("en")
        .alias("lang"),
    )


def test_stratified_sample_quota_and_determinism(spark):
    d = _docs(spark)
    out = stratified_sample(d, ["lang"], 20, "doc_id")
    per = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per["en"] == 20 and per["de"] == 20
    assert per["fr"] == 6  # smaller than quota → whole stratum, exact
    # deterministic: same rows on a rerun and under a different partitioning
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in stratified_sample(d.repartition(13), ["lang"], 20, "doc_id").collect()
    )
    assert a == b
    # schema untouched (helper columns dropped)
    assert out.columns == d.columns


def test_stratified_sample_matches_full_window(spark):
    """The prefilter must select the same rows as the naive full-input
    window (k smallest hashes per stratum)."""
    from pyspark.sql import Window

    from pentaho_kettle_spark.functions.sampling import _unit_hash

    d = _docs(spark, 300)
    k = 15
    fast = sorted(r.doc_id for r in stratified_sample(d, ["lang"], k, "doc_id").collect())
    w = Window.partitionBy("lang").orderBy(F.col("_u"), F.col("doc_id"))
    naive = (
        d.withColumn("_u", _unit_hash(F.col("doc_id")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    assert fast == sorted(r.doc_id for r in naive.collect())


def test_train_eval_split_stable_and_salted(spark):
    d = _docs(spark)
    s1 = {r.doc_id: r.split for r in train_eval_split(d, 0.2).collect()}
    s2 = {r.doc_id: r.split for r in train_eval_split(d.repartition(7), 0.2).collect()}
    assert s1 == s2  # partitioning-independent
    n_eval = sum(1 for v in s1.values() if v == "eval")
    assert 0.1 < n_eval / len(s1) < 0.3  # roughly the requested fraction
    # a different salt draws an independent split
    s3 = {r.doc_id: r.split for r in train_eval_split(d, 0.2, salt="other").collect()}
    assert s3 != s1

    # zero shuffles: pure projection
    from pentaho_kettle_spark.plans.explain import count_shuffles

    assert count_shuffles(train_eval_split(d, 0.2)) == 0
