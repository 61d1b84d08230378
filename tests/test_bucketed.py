"""Bucketed catalog tables eliminate the join/agg shuffle (tableio/bucketed)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pentaho_kettle_spark.tableio.bucketed import (
    colocated_join,
    plan_shuffle_count,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    left = spark.range(0, 10000).select(
        F.concat(F.lit("conv-"), F.col("id") % 500).alias("conv_id"),
        (F.col("id") % 7).alias("turn_idx"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 500).select(
        F.concat(F.lit("conv-"), F.col("id")).alias("conv_id"),
        (F.col("id") % 3).alias("label"),
    )
    write_bucketed(left, "t_left", ["conv_id"], 8, sort_cols=["conv_id"],
                   path=str(base / "l"))
    write_bucketed(right, "t_right", ["conv_id"], 8, sort_cols=["conv_id"],
                   path=str(base / "r"))
    yield "t_left", "t_right"
    spark.sql("DROP TABLE IF EXISTS t_left")
    spark.sql("DROP TABLE IF EXISTS t_right")


def test_colocated_join_no_shuffle(spark, bucketed_pair):
    l, r = bucketed_pair
    with_hint = colocated_join(
        spark, l, r, ["conv_id"]
    ).hint("merge")  # pin SMJ so autoBroadcast doesn't mask the property
    with_hint.collect()
    assert plan_shuffle_count(with_hint) == 0
    # the same aggregation on an unbucketed frame DOES shuffle — the control
    ctrl = spark.range(0, 100000).groupBy((F.col("id") % 7).alias("k")).count()
    ctrl.collect()
    assert plan_shuffle_count(ctrl) > 0


def test_bucketed_groupby_no_shuffle(spark, bucketed_pair):
    l, _ = bucketed_pair
    agg = spark.table(l).groupBy("conv_id").agg(F.sum("payload").alias("s"))
    agg.collect()
    assert plan_shuffle_count(agg) == 0


def test_join_result_correct(spark, bucketed_pair):
    l, r = bucketed_pair
    out = colocated_join(spark, l, r, ["conv_id"])
    assert out.count() == 10000  # every left row matches exactly one label
    row = out.filter((F.col("conv_id") == "conv-7") & (F.col("turn_idx") == 0)).first()
    assert row.label == 7 % 3
