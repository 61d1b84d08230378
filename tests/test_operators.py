"""Unit tests for Kettle semantic pins the oracle harness can't see
(two-output routing, error streams, SCD2 shape, coercions)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from pentaho_kettle_spark import operators as ops
from pentaho_kettle_spark import types as ktypes


def test_filter_rows_null_goes_to_false_target(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 1.0)], "id int, v double"
    )
    t, f = ops.filter_rows(df, {"field": "v", "function": ">", "value": 5.0})
    assert [r.id for r in t.collect()] == [1]
    assert sorted(r.id for r in f.collect()) == [2, 3]  # NULL routed false, not dropped


def test_condition_tree_and_or(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "id int, s string")
    cond = {
        "op": "OR",
        "children": [
            {"field": "s", "function": "=", "value": "b"},
            {"field": "id", "function": ">=", "value": 3},
        ],
    }
    t, _ = ops.filter_rows(df, cond)
    assert sorted(r.id for r in t.collect()) == [2, 3]


def test_unique_rows_duplicate_stream(spark):
    df = spark.createDataFrame(
        [(1, "x", 1), (1, "x", 2), (2, "y", 3)], "k int, s string, ord int"
    )
    kept, dups = ops.unique_rows(
        df, ["k"], count_field="n", order_by=["ord"], emit_duplicates=True
    )
    k = {r.k: r.n for r in kept.collect()}
    assert k == {1: 2, 2: 1}
    assert [r.ord for r in dups.collect()] == [2]


def test_validator_split(spark):
    df = spark.createDataFrame([(1, 5), (2, -1), (3, None)], "id int, v int")
    valid, errors = ops.validator(
        df,
        [
            {"field": "v", "kind": "not_null", "description": "v null"},
            {"field": "v", "kind": "min", "value": 0, "description": "v negative"},
        ],
    )
    assert [r.id for r in valid.collect()] == [1]
    errs = {r.id: r.error_description for r in errors.collect()}
    assert errs == {2: "v negative", 3: "v null"}


def test_value_mapper_default_passthrough(spark):
    df = spark.createDataFrame([("a",), ("z",)], "s string")
    out = ops.value_mapper(df, "s", {"a": "A"}, default=None)
    assert sorted(r.s for r in out.collect()) == ["A", "z"]


def test_scd2_versions(spark):
    rows = [
        ("u1", "red", dt.datetime(2026, 1, 1)),
        ("u1", "red", dt.datetime(2026, 1, 2)),  # no change → no new version
        ("u1", "blue", dt.datetime(2026, 1, 3)),
        ("u2", "green", dt.datetime(2026, 1, 1)),
    ]
    df = spark.createDataFrame(rows, "k string, color string, ts timestamp")
    dim = ops.scd2_apply(None, df, ["k"], ["color"], ts_col="ts")
    got = {(r.k, r.version): (r.color, r.date_from, r.date_to) for r in dim.collect()}
    assert got[("u1", 1)][0] == "red"
    assert got[("u1", 2)][0] == "blue"
    assert got[("u1", 1)][2] == dt.datetime(2026, 1, 3)  # closed by successor
    assert got[("u2", 1)][0] == "green"
    assert len(got) == 3


def test_scd2_incremental_close(spark):
    base = spark.createDataFrame(
        [("u1", "red", dt.datetime(2026, 1, 1))], "k string, color string, ts timestamp"
    )
    dim = ops.scd2_apply(None, base, ["k"], ["color"], ts_col="ts")
    upd = spark.createDataFrame(
        [("u1", "blue", dt.datetime(2026, 2, 1))], "k string, color string, ts timestamp"
    )
    dim2 = ops.scd2_apply(dim, upd, ["k"], ["color"], ts_col="ts")
    rows = sorted(dim2.collect(), key=lambda r: r.version)
    assert len(rows) == 2
    assert rows[0].date_to == dt.datetime(2026, 2, 1)
    assert rows[1].version == 2 and rows[1].color == "blue"


def test_kettle_boolean_coercion(spark):
    df = spark.createDataFrame([("Y",), ("no",), ("TRUE",), ("1",), (None,)], "s string")
    out = df.select(ktypes.coerce_to_boolean(F.col("s")).alias("b"))
    assert [r.b for r in out.collect()] == [True, False, True, True, None]


def test_calculator_working_days(spark):
    from pentaho_kettle_spark.operators.calculator import Calc

    df = spark.createDataFrame(
        [(dt.datetime(2026, 8, 10), dt.datetime(2026, 8, 14))], "a timestamp, b timestamp"
    )  # Mon..Fri
    out = ops.calculator(df, [Calc("wd", "DATE_WORKING_DIFF", "b", "a")])
    assert out.collect()[0].wd == 5


def test_group_by_include_all_rows_cumulative(spark):
    df = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 2, 2.0), ("g", 3, 3.0)], "k string, ord int, v double"
    )
    from pentaho_kettle_spark.operators.group_by import Agg, group_by_include_all_rows

    out = group_by_include_all_rows(
        df, ["k"], [Agg("v", "SUM", "running")], order_by=["ord"], cumulative=True
    )
    assert [r.running for r in out.orderBy("ord").collect()] == [1.0, 3.0, 6.0]


def test_append_streams_order(spark):
    a = spark.createDataFrame([(1,)], "x int")
    b = spark.createDataFrame([(2,)], "x int")
    out = ops.append_streams(a, b, order_field="o")
    assert [r.x for r in out.orderBy("o").collect()] == [1, 2]


def test_stream_lookup_defaults(spark):
    stream = spark.createDataFrame([(1,), (2,)], "k int")
    lkp = spark.createDataFrame([(1, "one")], "k int, name string")
    out = ops.stream_lookup(stream, lkp, ["k"], {"name": "MISS"})
    got = {r.k: r.name for r in out.collect()}
    assert got == {1: "one", 2: "MISS"}


def test_select_values_meta_cast(spark):
    df = spark.createDataFrame([("12",)], "s string")
    out = ops.select_values(df, meta=[{"name": "s", "type": "Integer", "rename": "n"}])
    assert out.schema["n"].dataType.simpleString() == "bigint"
    assert out.collect()[0].n == 12


def test_switch_case_multiple_values_same_target(spark):
    """Kettle allows several case values to route to ONE target step —
    conditions must OR together, not overwrite."""
    df = spark.createDataFrame(
        [("P",), ("F",), ("O",), ("X",)], ["status"]
    )
    outs = ops.switch_case(
        df, "status", {"P": "open_like", "O": "open_like", "F": "closed"}
    )
    assert sorted(r.status for r in outs["open_like"].collect()) == ["O", "P"]
    assert [r.status for r in outs["closed"].collect()] == ["F"]
    assert [r.status for r in outs["default"].collect()] == ["X"]


def test_update_rows_discards_unknown_keys(spark):
    """Standalone Update (update/Update.java): existing keys take the
    incoming value; keys absent from the target are DISCARDED."""
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    incoming = spark.createDataFrame([(2, "B"), (9, "Z")], ["k", "v"])
    out = ops.update_rows(target, incoming, ["k"])
    assert {(r.k, r.v) for r in out.collect()} == {(1, "a"), (2, "B")}


def test_fuzzy_match_blocking_lossless_for_levenshtein(spark):
    """blocking='length' is LOSSLESS under the levenshtein + max_distance
    contract (edit distance ≤ d ⇒ length delta ≤ d): blocked output equals
    the unblocked crossJoin output, and the plan pairs candidates with an
    EQUI-join, not a cartesian product."""
    stream = spark.createDataFrame(
        [("kettle",), ("spark",), ("zzzzzzzzzzzz",)], ["word"]
    )
    lookup = spark.createDataFrame(
        [("kettle",), ("cattle",), ("sparc",), ("spear",)], ["cand"]
    )
    kw = dict(algorithm="levenshtein", max_distance=2)
    plain = ops.fuzzy_match(stream, lookup, "word", "cand", **kw)
    blocked = ops.fuzzy_match(stream, lookup, "word", "cand", blocking="length", **kw)
    # score is reported only alongside a kept match: the unblocked path
    # retains the best (over-threshold) score on unmatched rows, the blocked
    # path never scored anything — the MATCH contract is what must agree
    as_set = lambda df: {(r.word, r.match) for r in df.collect()}
    got = as_set(blocked)
    assert got == as_set(plain)
    assert ("zzzzzzzzzzzz", None) in got  # no block → NULL match
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_fuzzy_match_blocking_scale(spark):
    """10^4 x 10^4: length blocking completes where the crossJoin would
    enumerate 10^8 pairs. Strings spread over ~40 length blocks, so the
    equi-join pairs ~d-band neighbors only."""
    import pyspark.sql.functions as SF

    n = 10_000
    stream = spark.range(n).select(
        SF.concat(SF.lit("w"), SF.col("id").cast("string"),
                  SF.expr("repeat('x', CAST(id % 40 AS INT))")).alias("word")
    )
    lookup = spark.range(n).select(
        SF.concat(SF.lit("w"), SF.col("id").cast("string"),
                  SF.expr("repeat('x', CAST((id + 1) % 40 AS INT))")).alias("cand")
    )
    out = ops.fuzzy_match(
        stream, lookup, "word", "cand",
        algorithm="levenshtein", max_distance=1, blocking="length",
    )
    assert out.count() == n
    # spot-check: w5xxxxx has two distance-1 candidates (w4xxxxx by
    # substitution, w5xxxxxx by insertion) — tie broken lexicographically
    row = out.filter(SF.col("word") == "w5" + "x" * 5).first()
    assert row.score == 1 and row.match == "w4" + "x" * 5


def test_fuzzy_match_first_letter_blocking(spark):
    """Lossy first-letter blocking: candidates in another block are never
    scored; an empty block yields a NULL match."""
    stream = spark.createDataFrame([("martha",), ("quincy",)], ["word"])
    lookup = spark.createDataFrame([("marhta",), ("zebra",)], ["cand"])
    out = ops.fuzzy_match(
        stream, lookup, "word", "cand",
        algorithm="jaro_winkler", blocking="first_letter",
    )
    got = {r.word: r.match for r in out.collect()}
    assert got["martha"] == "marhta"
    assert got["quincy"] is None


def test_unique_rows_order_by_pins_winner_under_repartition(spark):
    """order_by must pick the same winner regardless of input partitioning
    (r6: the old dropDuplicates path kept an arbitrary row)."""
    from pyspark.sql import functions as F

    from pentaho_kettle_spark.operators.sort_rows import unique_rows

    rows = [("a", i % 3, 100 - i) for i in range(60)]  # key "a"/keyed by k
    df = spark.createDataFrame(rows, "key string, k int, v int")
    for parts in (1, 7):
        out = unique_rows(
            df.repartition(parts), ["key", "k"], order_by=["v"]
        ).orderBy("k").collect()
        # winner per (key, k) = the row with the smallest v
        assert [(r["k"], r["v"]) for r in out] == [(0, 43), (1, 42), (2, 41)]
        assert [r["key"] for r in out] == ["a", "a", "a"]
