"""ScriptValuesMod: the JS-expression → Catalyst subset (plans/jsexpr.py)
and the .ktr step builder wired onto it."""

from __future__ import annotations

import os

import pytest

from pentaho_kettle_spark.plans.jsexpr import compile_expr, compile_script

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _eval(spark, expr, row, env=None):
    df = spark.createDataFrame([row])
    return df.select(compile_expr(expr, env).alias("r")).first().r


def test_arithmetic_and_precedence(spark):
    row = {"a": 7, "b": 2.0}
    assert _eval(spark, "a + b * 3", row) == 13.0
    assert _eval(spark, "(a + b) * 3", row) == 27.0
    assert _eval(spark, "a % 4 - -b", row) == 5.0
    assert _eval(spark, "Math.round(a / b)", row) == 4


def test_ternary_logic_comparison(spark):
    row = {"qty": 15, "name": "widget"}
    assert _eval(spark, "qty > 10 ? 'big' : 'small'", row) == "big"
    assert _eval(spark, "qty > 10 && name == 'widget'", row) is True
    assert _eval(spark, "qty < 10 || name != 'widget'", row) is False
    assert _eval(spark, "!(qty === 15)", row) is False


def test_string_methods(spark):
    row = {"s": "  Hello World  "}
    assert _eval(spark, "s.trim().toUpperCase()", row) == "HELLO WORLD"
    assert _eval(spark, "s.trim().substr(0, 5)", row) == "Hello"
    assert _eval(spark, "s.trim().substring(6, 11)", row) == "World"
    assert _eval(spark, "s.trim().indexOf('World')", row) == 6
    assert _eval(spark, "s.trim().replace('World', 'JS')", row) == "Hello JS"
    assert _eval(spark, "s.length", row) == 15
    assert _eval(spark, "'id-'.concat(s.trim().toLowerCase())", row) == "id-hello world"


def test_script_var_chaining(spark):
    env = compile_script(
        """
        // net then tax referencing net
        var net = price * qty;
        var taxed = net * 1.19;
        """
    )
    df = spark.createDataFrame([{"price": 10.0, "qty": 3}])
    r = df.select(*[c.alias(n) for n, c in env.items()]).first()
    assert r.net == 30.0 and abs(r.taxed - 35.7) < 1e-9


def test_plus_is_concat_on_string_operands(spark):
    """JS '+' with a string operand is CONCATENATION — the single most
    common ScriptValuesMod idiom (var key = name + '_' + id;). Operand
    types flow from the schema passed to compile_script/compile_expr;
    string literals type themselves."""
    df = spark.createDataFrame([{"name": "ord", "id": 7, "amt": 2.5}])
    env = compile_script(
        """
        var key = name + '_' + id;
        var total = amt + id;
        var label = 'amt=' + amt;
        var keyed = key + id;
        """,
        schema=df.schema,
    )
    r = df.select(*[c.alias(n) for n, c in env.items()]).first()
    assert r.key == "ord_7"           # str col + str lit + num col → concat
    assert r.total == 9.5             # num + num stays numeric addition
    assert r.label == "amt=2.5"       # str lit + double col
    assert r.keyed == "ord_77"        # script var typed str propagates

    # without a schema the columns are untyped → numeric '+' (legacy path)
    legacy = compile_script("var total = amt + id;")
    assert df.select(legacy["total"].alias("t")).first().t == 9.5


def test_unsupported_constructs_raise():
    with pytest.raises(NotImplementedError, match="script_values"):
        compile_script("for (var i = 0; i < 10; i++) { x += i; }")
    with pytest.raises(NotImplementedError, match="unsupported method"):
        compile_expr("s.match('x')")
    with pytest.raises(NotImplementedError, match="Math"):
        compile_expr("Math.random()")


def test_ktr_script_values_mod_step(spark):
    from pentaho_kettle_spark.plans.ktr import run_ktr

    outs = run_ktr(spark, os.path.join(FIX, "sample_js.ktr"))
    rows = {r.order_id: r for r in outs["Script"].collect()}
    assert rows[1].fee == round(200.0 * 2.5 / 100, 10)
    assert rows[1].size_label == "big"
    assert rows[2].size_label == "small"
    # declared Integer output is cast
    assert isinstance(rows[1].fee_cents, int)
    assert rows[1].fee_cents == 500
