"""Physical-plan assertions — the 'would this survive 100×?' gates.

Checks the properties the operators PROMISE, not just their output:
broadcast where the contract says broadcast, filters pushed to the scan,
bounded shuffle counts, column pruning reaching the reader.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pentaho_kettle_spark import operators as ops
from pentaho_kettle_spark.plans.explain import (
    count_shuffles,
    plan_summary,
    read_schema_columns,
)

SF = "/root/testdata/sf0.001"


def test_stream_lookup_is_broadcast(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = spark.read.parquet(f"{SF}/part.parquet")
    out = ops.stream_lookup(li, p, [("l_partkey", "p_partkey")], ["p_brand"])
    s = plan_summary(out)
    assert s["broadcast_joins"] >= 1
    assert s["sort_merge_joins"] == 0


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    t, _ = ops.filter_rows(li, {"field": "l_quantity", "function": ">", "value": 30.0})
    out = t.select("l_orderkey")
    s = plan_summary(out)
    assert s["pushed_filters"], s["plan"]


def test_column_pruning_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    out = ops.select_values(li, select=[("l_orderkey", None), ("l_quantity", "qty")])
    cols = read_schema_columns(out)
    assert set(cols) == {"l_orderkey", "l_quantity"}


def test_lww_collapse_single_shuffle(spark):
    from pentaho_kettle_spark.cdc.changelog import CHANGELOG_SCHEMA
    from pentaho_kettle_spark.cdc.lww import lww_collapse
    from pentaho_kettle_spark.fixtures.changelog_gen import gen_changelog

    pdf = gen_changelog(500, 50, seed=3)
    log = spark.createDataFrame(pdf, schema=CHANGELOG_SCHEMA).drop("ingest_ts")
    out = lww_collapse(log)
    assert count_shuffles(out) == 1  # one hash-agg exchange, nothing else


def test_group_by_partial_aggregation(spark):
    from pentaho_kettle_spark.operators.group_by import Agg

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    out = ops.group_by(li, ["l_returnflag"], [Agg("l_quantity", "SUM", "s")])
    p = plan_summary(out)["plan"]
    # partial_sum before the exchange = map-side combine
    assert "partial_sum" in p or "partial_" in p, p


def test_merge_rows_diff_single_join(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    d = ops.merge_rows_diff(o, o, ["o_orderkey"])
    assert plan_summary(d)["sort_merge_joins"] + plan_summary(d)["broadcast_joins"] >= 1
    assert count_shuffles(d) <= 3


def test_topk_no_global_sort(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    out = ops.top_k(o, [("o_totalprice", False)], 10)
    assert "TakeOrderedAndProject" in plan_summary(out)["plan"]



def test_ktr_loader_plans_push_down(spark):
    """Plans built BY THE .KTR LOADER get the same Catalyst treatment as
    hand-built ones: the FilterRows predicate reaches the parquet scan and
    the rollup needs a bounded number of exchanges."""
    import __spark_entry__ as e

    out = e.queries()["ktr_lineitem_rollup"](spark, SF)
    s = plan_summary(out)
    assert s["pushed_filters"], s["plan"]  # l_quantity >= 25 at the scan
    # exactly one agg exchange + one sort range exchange; never a
    # per-step materialization boundary
    assert count_shuffles(out) == 2, s["plan"]


def test_ktr_mapping_adds_no_shuffle(spark):
    """A Mapping sub-transformation is plan composition, not an execution
    boundary: the parent+child fee pipeline is pure projection — ZERO
    exchanges — and reads only the projected columns."""
    import __spark_entry__ as e

    out = e.queries()["ktr_mapping_fee"](spark, SF)
    assert count_shuffles(out) == 0
    cols = read_schema_columns(out)
    assert set(cols) == {"o_orderkey", "o_totalprice", "o_orderpriority"}


def test_row_shaping_chain_fuses_to_scan(spark):
    """Five chained row-shaping 'steps' must collapse into one projection
    over the scan: zero shuffles, and only the referenced columns read."""
    c = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    x = ops.add_constants(c, {"src": "crm"})
    x = ops.set_field_value(x, "segment_copy", from_field="c_mktsegment")
    x = ops.null_if(x, "c_mktsegment", "BUILDING")
    x = ops.if_null(x, {"c_mktsegment": "UNKNOWN"})
    x = ops.split_fields(x, "c_name", "#", ["p_label", "p_num"], drop_source=True)
    out = x.select("c_custkey", "src", "segment_copy", "c_mktsegment", "p_label")
    assert count_shuffles(out) == 0
    cols = read_schema_columns(out)
    assert "c_acctbal" not in cols  # pruned: projected away before the sink
    assert set(cols) <= {"c_custkey", "c_mktsegment", "c_name"}


def test_js_script_ktr_stays_jvm_side(spark):
    """ScriptValuesMod via jsexpr compiles to Catalyst expressions: no
    Python evaluator node (mapInPandas/BatchEvalPython) in the plan."""
    import os

    from pentaho_kettle_spark.plans.ktr import run_ktr

    ktr = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "orders_js.ktr",
    )
    o = spark.read.parquet(f"{SF}/orders.parquet")
    outs = run_ktr(spark, ktr, inputs={"Orders": o})
    plan = outs["Score"]._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert count_shuffles(outs["Score"]) == 0
