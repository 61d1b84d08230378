"""The .ktr loader: a Kettle transformation file runs on this engine and
produces the rows the reference's step graph would."""

from __future__ import annotations

import os

import pytest

from pentaho_kettle_spark.plans.ktr import parse_ktr, run_ktr

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_parse_ktr():
    t = parse_ktr(os.path.join(FIX, "sample_trans.ktr"))
    assert t.name == "orders_rollup"
    assert len(t.steps) == 7
    assert ("Orders grid", "Big orders only") in t.hops


def test_run_ktr_pipeline(spark):
    outs = run_ktr(spark, os.path.join(FIX, "sample_trans.ktr"))
    # terminals: the sorted rollup and the false-branch Dummy
    assert set(outs) == {"Sort output", "Small orders"}
    rollup = [(r.status_label, r.total, r.n) for r in outs["Sort output"].collect()]
    # big orders (>=50): 1 P 100, 2 F 250.5, 3 P 80 → Pending 180/2, Fulfilled 250.5/1
    assert rollup == [("Fulfilled", 250.5, 1), ("Pending", 180.0, 2)]
    small = sorted(r.order_id for r in outs["Small orders"].collect())
    assert small == [4, 5]
    # Calculator ran: fee = amount*100/1000 = amount/10 on the big branch
    fee_cols = outs["Sort output"].columns
    assert "total" in fee_cols and "n" in fee_cols


def test_run_ktr_merge_join(spark):
    outs = run_ktr(spark, os.path.join(FIX, "sample_join.ktr"))
    rows = {r.k: r.label for r in outs["Join"].collect()}
    assert rows == {1: "one", 2: "two", 3: None}


def test_run_ktr_row_shaping_sweep(spark):
    """IfNull → FieldSplitter → StringOperations → NumberRange → Janino →
    ConcatFields → CheckSum → Sequence, all from one .ktr file."""
    outs = run_ktr(spark, os.path.join(FIX, "sample_shaping.ktr"))
    rows = {r.id: r for r in outs["Seq"].collect()}
    assert rows[2].nick == "anon" and rows[1].nick == "ada"
    assert rows[1].first == "ADA" and rows[1].last == "lovelace"
    assert "full_name" not in outs["Seq"].columns  # splitter drops the source
    assert (rows[1].band, rows[2].band, rows[3].band) == ("high", "low", "mid")
    assert rows[3].bonus == 73.25 * 2 + 3
    assert rows[1].handle == "ADA_ada"
    assert len(rows[1].row_hash) == 64  # sha256 hex
    assert sorted(r.rownum for r in rows.values()) == sorted(
        {r.rownum for r in rows.values()}
    )  # unique sequence values


def test_run_ktr_merge_rows_diff_and_lag(spark):
    outs = run_ktr(spark, os.path.join(FIX, "sample_diff.ktr"))
    rows = {r.k: r for r in outs["Prev value"].collect()}
    assert rows[1].flag == "identical"
    assert rows[2].flag == "changed" and rows[2].v == "B2"
    assert rows[3].flag == "deleted" and rows[3].v == "c"
    assert rows[4].flag == "new" and rows[4].v == "d"
    assert rows[4].prev_v is None  # first in its flag group


def test_unsupported_step_raises(spark, tmp_path):
    p = tmp_path / "bad.ktr"
    p.write_text(
        """<?xml version="1.0"?><transformation><info><name>x</name></info>
        <step><name>s</name><type>SalesforceInput</type></step><order/></transformation>"""
    )
    with pytest.raises(NotImplementedError, match="SalesforceInput"):
        run_ktr(spark, str(p))


def test_run_ktr_generators_sweep(spark):
    """RowGenerator → CloneRow → Validator (error hop) and
    RowGenerator → RegexEval → SampleRows, from one .ktr."""
    outs = run_ktr(spark, os.path.join(FIX, "sample_generators.ktr"))
    assert set(outs) == {"OK", "Errs", "Sample"}
    ok = outs["OK"].collect()
    errs = outs["Errs"].collect()
    # 6 generated rows cloned x2 = 12; rn=1 rows (x2) fail min_value=2
    assert len(ok) == 10 and len(errs) == 2
    assert {r.cnum for r in ok} == {0, 1}
    assert all(r.rn == 1 for r in errs)
    assert errs[0].error_field == "rn"
    sample = outs["Sample"].collect()
    assert sorted(r.rn for r in sample) == [1, 2, 5]  # ranges 1..2 and 5
    assert all(r.matched and r.w1 == "alpha" and r.w2 == "beta" for r in sample)


def test_run_ktr_streams_sweep(spark):
    """Append → BlockingStep → WriteToLog → ExecSQL, plus SortedMerge,
    PrioritizeStreams and DetectEmptyStream over two grids."""
    outs = run_ktr(spark, os.path.join(FIX, "sample_streams.ktr"))
    assert set(outs) == {"FinalSQL", "SM", "Prio", "Empty"}
    final = [(r.k, r.v) for r in outs["FinalSQL"].collect()]
    assert final == [(1, "a1"), (2, "b2"), (3, "a3")]
    sm = [r.k for r in outs["SM"].toPandas().itertuples()]
    assert sorted(sm) == [1, 2, 3, 4]
    prio = outs["Prio"].collect()
    assert len(prio) == 4
    assert outs["Empty"].count() == 2  # non-empty stream passes through


def test_run_ktr_abort(spark):
    with pytest.raises(RuntimeError, match="too many rows"):
        run_ktr(spark, os.path.join(FIX, "sample_abort.ktr"))


def test_table_input_requires_binding(spark):
    """TableInput without a pre-bound DataFrame or connection raises the
    documented error (no JDBC driver in the sandbox)."""
    import textwrap

    p = os.path.join(FIX, "_tmp_tablein.ktr")
    with open(p, "w") as f:
        f.write(textwrap.dedent("""\
            <?xml version="1.0"?>
            <transformation>
              <info><name>ti</name></info>
              <step><name>T</name><type>TableInput</type><sql>SELECT 1</sql></step>
              <order/>
            </transformation>
        """))
    try:
        with pytest.raises(NotImplementedError, match="pre-bound"):
            run_ktr(spark, p)
        # pre-binding replaces the step entirely
        df = spark.createDataFrame([(1,)], ["x"])
        outs = run_ktr(spark, p, inputs={"T": df})
        assert outs["T"].collect()[0].x == 1
    finally:
        os.remove(p)


def test_run_kjb_success_path(spark):
    """START → TRANS → TRANS → SUCCESS with conditional hops."""
    from pentaho_kettle_spark.plans.kjb import run_kjb

    res = run_kjb(spark, os.path.join(FIX, "sample_job.kjb"))
    assert res.success
    assert res.executed == ["START", "rollup", "streams", "done"]
    rollup = res.results["rollup"]["Sort output"].collect()
    assert [(r.status_label, r.n) for r in rollup] == [("Fulfilled", 1), ("Pending", 2)]
    assert res.results["streams"]["FinalSQL"].count() == 3


def test_run_kjb_failure_routing(spark):
    """A failing transformation routes the evaluation=N hop; cleanup runs,
    then ABORT marks the job failed."""
    from pentaho_kettle_spark.plans.kjb import run_kjb

    res = run_kjb(spark, os.path.join(FIX, "sample_job_fail.kjb"))
    assert not res.success
    assert res.executed == ["START", "guard", "cleanup", "bail"]
    assert "never" not in res.executed
    assert res.failed_entry == "bail"
    assert "guard tripped" in res.error or "too many rows" in res.error
    # the cleanup transformation really ran
    assert res.results["cleanup"]["Join"].count() == 3


def test_run_ktr_mapping_subtransformation(spark):
    """Mapping step: parent rows flow through a reusable child .ktr
    (MappingInput → Calculator → MappingOutput) with field renames on both
    edges — and the composition is ONE Catalyst plan, no materialization."""
    outs = run_ktr(spark, os.path.join(FIX, "parent_mapping.ktr"))
    assert set(outs) == {"Apply fee mapping"}
    out = outs["Apply fee mapping"]
    rows = {r.order_id: r for r in out.collect()}
    # child computes fee = amt + amt*rate/100 on renamed columns
    assert rows[1].order_fee == 200.0 + 200.0 * 10.0 / 100
    assert rows[2].order_fee == 50.0 + 50.0 * 20.0 / 100
    # renames round-tripped: parent names visible, child names gone
    assert "amount" in out.columns and "amt" not in out.columns
    assert "order_fee" in out.columns and "fee" not in out.columns


def test_mapping_input_standalone_raises(spark):
    with pytest.raises(NotImplementedError, match="MappingInput"):
        run_ktr(spark, os.path.join(FIX, "child_mapping.ktr"))


def test_kjb_fanout_executes_all_matching_hops(spark):
    """Two hops out of START: the reference Job engine runs BOTH next
    entries (serial depth-first), not just the first match."""
    from pentaho_kettle_spark.plans.kjb import run_kjb

    res = run_kjb(spark, os.path.join(FIX, "sample_job_fanout.kjb"))
    assert res.success
    assert "rollup" in res.executed and "join" in res.executed
    assert set(res.results) == {"rollup", "join"}
    rows = {r.k: r.label for r in res.results["join"]["Join"].collect()}
    assert rows == {1: "one", 2: "two", 3: None}


def test_metainject_pure_xml_rewrite():
    """inject() alone (no Spark): scalar path creation + repeating-group
    replacement on a template file."""
    import xml.etree.ElementTree as ET

    from pentaho_kettle_spark.plans.metainject import (
        InjectRows,
        InjectValue,
        inject,
    )

    out = inject(
        os.path.join(FIX, "template_inject.ktr"),
        [
            InjectValue("Filt", "compare/condition/value/text", 15),
            InjectRows(
                "Map", "fields/field",
                [{"source_value": "a", "target_value": "alpha"},
                 {"source_value": "b", "target_value": "beta"}],
            ),
        ],
    )
    try:
        root = ET.parse(out).getroot()
        steps = {s.findtext("name"): s for s in root.findall("step")}
        assert steps["Filt"].findtext("compare/condition/value/text") == "15"
        fields = steps["Map"].findall("fields/field")
        assert [(f.findtext("source_value"), f.findtext("target_value"))
                for f in fields] == [("a", "alpha"), ("b", "beta")]
    finally:
        os.unlink(out)


def test_metainject_step_runs_template(spark):
    """MetaInject step: config grids rewrite the template's ValueMapper
    fields and FilterRows threshold, then the template runs."""
    outs = run_ktr(spark, os.path.join(FIX, "meta_parent.ktr"))
    assert set(outs) == {"Inject"}
    rows = {r.k: r.label for r in outs["Inject"].collect()}
    # threshold 15 keeps k=20,30; mapper labels b->beta, c->Other
    assert rows == {20: "beta", 30: "Other"}


def test_rowgenerator_never_ending_is_streaming(spark):
    """never_ending RowGenerator compiles to the rate streaming source at
    the interval-equivalent rows/sec; downstream steps compose lazily."""
    outs = run_ktr(spark, os.path.join(FIX, "sample_rate_gen.ktr"))
    df = outs["Tag"]
    assert df.isStreaming
    assert set(df.columns) == {"source", "generated_ts", "beat_num", "beat_mod"}
    # drive one micro-batch to prove the plan executes end-to-end
    q = (
        df.writeStream.format("memory")
        .queryName("pks_beat_test")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from pks_beat_test").collect()
    assert all(r.source == "heartbeat" for r in rows)
