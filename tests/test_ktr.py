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


def test_mapping_rename_on_output_flag(spark):
    """MappingIODefinition loads <rename_on_output> as
    'Y'.equalsIgnoreCase(tag): Y reverts the parent→child input renames at
    MappingOutput; N — and a MISSING tag — keeps the CHILD names downstream.
    Only SimpleMapping forces the revert regardless of the tag."""
    # explicit Y — revert: parent names back on the output stream
    out_y = run_ktr(spark, os.path.join(FIX, "parent_mapping_rename_y.ktr"))[
        "Apply fee mapping"
    ]
    assert "amount" in out_y.columns and "amt" not in out_y.columns
    # explicit N — child-side names survive on the output stream
    out_n = run_ktr(spark, os.path.join(FIX, "parent_mapping_norename.ktr"))[
        "Apply fee mapping"
    ]
    assert "amt" in out_n.columns and "amount" not in out_n.columns
    assert "rate" in out_n.columns and "pct" not in out_n.columns
    # output-connector renames are independent of the input flag
    assert "order_fee" in out_n.columns and "fee" not in out_n.columns
    # MISSING tag — getTagValue returns null, equalsIgnoreCase('Y') is false:
    # keep child names (hand-authored .ktr without the tag)
    out_m = run_ktr(spark, os.path.join(FIX, "parent_mapping_noflag.ktr"))[
        "Apply fee mapping"
    ]
    assert "amt" in out_m.columns and "amount" not in out_m.columns
    # SimpleMapping: renamingOnOutput hardwired true — revert even w/o tag
    out_s = run_ktr(spark, os.path.join(FIX, "parent_simplemapping.ktr"))[
        "Apply fee mapping"
    ]
    assert "amount" in out_s.columns and "amt" not in out_s.columns


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


def test_kjb_parallel_launch(spark):
    """Kettle's launch-next-entries-in-parallel flag (<parallel>Y on the
    entry): both TRANS branches run (in threads) and the job waits for
    them; the conditional hop off one branch still fires."""
    from pentaho_kettle_spark.plans.kjb import run_kjb

    res = run_kjb(spark, os.path.join(FIX, "sample_job_parallel.kjb"))
    assert res.success
    assert set(res.results) == {"rollup", "join"}
    assert "done" in res.executed
    rows = {r.k: r.label for r in res.results["join"]["Join"].collect()}
    assert rows == {1: "one", 2: "two", 3: None}


def test_kjb_handled_failure_still_fails_job(spark):
    """nrErrors accumulation: a TRANS failure routed through a failure hop
    that terminates normally (no ABORT, no SUCCESS) must still fail the
    overall job and record the failing entry."""
    from pentaho_kettle_spark.plans.kjb import run_kjb

    res = run_kjb(spark, os.path.join(FIX, "sample_job_handled_fail.kjb"))
    assert res.executed == ["START", "guard", "cleanup"]
    assert not res.success
    assert res.failed_entries == ["guard"]
    assert res.failed_entry == "guard"
    # the cleanup transformation really ran despite the failure
    assert res.results["cleanup"]["Join"].count() == 3


def test_kjb_long_chain_no_recursion(spark, tmp_path):
    """A linear chain near max_entries completes iteratively — the old
    one-Python-frame-per-entry recursion hit RecursionError before the
    friendly max_entries guard."""
    from pentaho_kettle_spark.plans.kjb import run_kjb

    n = 1500
    entries = ['<entry><name>START</name><type>SPECIAL</type><start>Y</start></entry>']
    hops = []
    prev = "START"
    for i in range(n):
        entries.append(f"<entry><name>d{i}</name><type>DUMMY</type></entry>")
        hops.append(
            f"<hop><from>{prev}</from><to>d{i}</to><unconditional>Y</unconditional></hop>"
        )
        prev = f"d{i}"
    kjb = (
        '<?xml version="1.0"?><job><name>chain</name><entries>'
        + "".join(entries)
        + "</entries><hops>"
        + "".join(hops)
        + "</hops></job>"
    )
    p = tmp_path / "chain.kjb"
    p.write_text(kjb)
    res = run_kjb(spark, str(p), max_entries=n + 10)
    assert res.success and len(res.executed) == n + 1
    # and the guard still catches a genuine over-run
    with pytest.raises(RuntimeError, match="exceeded"):
        run_kjb(spark, str(p), max_entries=100)


def test_variables_unit():
    """Variables space: precedence (values > env > defaults), recursive
    expansion, %%VAR%% alt syntax, unknown-stays-verbatim, cycle cap."""
    import os as _os

    from pentaho_kettle_spark.plans.variables import Variables

    v = Variables({"A": "x", "B": "${A}/y"}, defaults={"D": "dflt"})
    assert v.substitute("${A}") == "x"
    assert v.substitute("${B}") == "x/y"  # recursive
    assert v.substitute("%%A%%-${D}") == "x-dflt"
    assert v.substitute("${NOPE}") == "${NOPE}"  # unknown stays verbatim
    _os.environ["PKS_TEST_VAR"] = "fromenv"
    try:
        assert v.substitute("${PKS_TEST_VAR}") == "fromenv"
        # caller value shadows env
        v2 = Variables({"PKS_TEST_VAR": "caller"})
        assert v2.substitute("${PKS_TEST_VAR}") == "caller"
    finally:
        del _os.environ["PKS_TEST_VAR"]
    # self-referential chain terminates
    loop = Variables({"L": "${L}x"})
    assert loop.substitute("${L}").endswith("x")


def test_run_ktr_variable_substitution(spark, tmp_path):
    """${VAR} resolution through a real .ktr: the CSV path comes from a
    caller variable, the filter threshold from the file's <parameters>
    default — and a caller override changes the plan."""
    (tmp_path / "orders.csv").write_text(
        "order_id,status,amount\n1,P,100.0\n2,F,250.5\n3,P,80.0\n4,O,10.0\n5,F,19.5\n"
    )
    outs = run_ktr(
        spark,
        os.path.join(FIX, "sample_vars.ktr"),
        variables={"DATA_DIR": str(tmp_path)},
    )
    assert [r.order_id for r in outs["Sorted"].collect()] == [1, 2, 3]
    # caller value overrides the file's MIN_AMOUNT default
    outs = run_ktr(
        spark,
        os.path.join(FIX, "sample_vars.ktr"),
        variables={"DATA_DIR": str(tmp_path), "MIN_AMOUNT": "200"},
    )
    assert [r.order_id for r in outs["Sorted"].collect()] == [2]


def test_kjb_set_variables_and_simple_eval(spark, tmp_path):
    """SET_VARIABLES mutates the job's variable space for later entries (the
    TRANS sees MIN_AMOUNT=200 override the .ktr's parameter default);
    SIMPLE_EVAL routes success/failure hops off a variable comparison
    re-substituted at eval time."""
    from pentaho_kettle_spark.plans.kjb import run_kjb

    (tmp_path / "orders.csv").write_text(
        "order_id,status,amount\n1,P,100.0\n2,F,250.5\n3,P,80.0\n"
    )
    base = {"DATA_DIR": str(tmp_path)}
    res = run_kjb(
        spark, os.path.join(FIX, "sample_job_vars.kjb"),
        variables={**base, "MODE": "quick"},
    )
    assert res.success
    # MIN_AMOUNT=200 came from the SET_VARIABLES entry, not the file default
    assert [r.order_id for r in res.results["filter"]["Sorted"].collect()] == [2]
    # quick != full → eval false → failure hop to the DUMMY branch
    assert "skipped" in res.executed and "full_run" not in res.executed

    res2 = run_kjb(
        spark, os.path.join(FIX, "sample_job_vars.kjb"),
        variables={**base, "MODE": "full"},
    )
    assert res2.success
    assert "full_run" in res2.executed and "skipped" not in res2.executed


def test_kjb_set_variables_overrides_parse_time_value(spark):
    """A SET_VARIABLES override must be visible to later entries even when
    the variable already HAD a value at parse time (here the job's own
    <parameter MODE=quick> default). Job XML is substituted per-entry at
    execution time against the live space (reference: each entry's
    environmentSubstitute at init) — resolving the tree once at parse bakes
    the stale 'quick' into the SIMPLE_EVAL text and silently routes the
    failure branch."""
    from pentaho_kettle_spark.plans.kjb import run_kjb

    res = run_kjb(spark, os.path.join(FIX, "sample_job_vars_override.kjb"))
    assert res.success, res.error
    assert "yes" in res.executed and "no" not in res.executed

    # a caller value is also override-able by SET_VARIABLES
    res2 = run_kjb(
        spark, os.path.join(FIX, "sample_job_vars_override.kjb"),
        variables={"MODE": "quick"},
    )
    assert res2.success, res2.error
    assert "yes" in res2.executed and "no" not in res2.executed


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


def test_get_variables_step(spark, tmp_path):
    """GetVariable step: variables become row fields (typed); with no
    incoming hop it emits one row."""
    ktr = """<?xml version="1.0"?><transformation>
      <info><name>gv</name></info>
      <parameters>
        <parameter><name>RUN_ID</name><default_value>r-7</default_value></parameter>
      </parameters>
      <step><name>Grid</name><type>DataGrid</type>
        <fields><field><name>k</name><type>Integer</type></field></fields>
        <data><line><item>1</item></line><line><item>2</item></line></data>
      </step>
      <step><name>Vars</name><type>GetVariable</type>
        <fields>
          <field><name>run_id</name><variable>${RUN_ID}</variable><type>String</type></field>
          <field><name>batch_no</name><variable>${BATCH}</variable><type>Integer</type></field>
        </fields>
      </step>
      <order><hop><from>Grid</from><to>Vars</to><enabled>Y</enabled></hop></order>
    </transformation>"""
    p = tmp_path / "gv.ktr"
    p.write_text(ktr)
    out = run_ktr(spark, str(p), variables={"BATCH": "42"})["Vars"]
    rows = out.orderBy("k").collect()
    assert [(r.k, r.run_id, r.batch_no) for r in rows] == [(1, "r-7", 42), (2, "r-7", 42)]


def test_kjb_result_rows_chaining(spark):
    """Copy rows to result → Get rows from result across two TRANS entries:
    the producer's filtered stream pre-binds onto the consumer's
    RowsFromResult step, lazily (one composed plan across the job hop)."""
    from pentaho_kettle_spark.plans.kjb import run_kjb

    res = run_kjb(spark, os.path.join(FIX, "sample_job_result_rows.kjb"))
    assert res.success
    rows = {r.k: r.fee for r in res.results["consume"]["Fee"].collect()}
    # only the two small rows flowed through; fee = amount * 1.1
    assert rows == {1: 10.0 * 1.1, 3: 30.0 * 1.1}


def test_rows_from_result_without_producer_fails(spark):
    from pentaho_kettle_spark.plans.ktr import run_ktr

    with pytest.raises(NotImplementedError, match="no result rows bound"):
        run_ktr(spark, os.path.join(FIX, "result_consumer.ktr"))


def test_kjb_result_rows_routed_publisher(spark):
    """A RowsToResult step with an OUTGOING hop still publishes to the job
    Result — the reference step writes to the Result regardless of what is
    wired after it; only terminal-step capture misses it."""
    from pentaho_kettle_spark.plans.kjb import run_kjb

    res = run_kjb(spark, os.path.join(FIX, "sample_job_result_rows_routed.kjb"))
    assert res.success, res.error
    fees = {r.k: r.fee for r in res.results["consume"]["Fee"].collect()}
    assert fees.keys() == {1, 2, 3}
    for k, amt in {1: 10.0, 2: 200.0, 3: 30.0}.items():
        assert fees[k] == pytest.approx(amt * 1.1)


def test_kjb_result_rows_cleared_by_intervening_trans(spark):
    """Each TRANS entry REPLACES the job Result: a transformation with no
    RowsToResult leaves an empty buffer, so a consumer two hops downstream
    must fail with 'no previous entry copied rows' instead of silently
    reading the entry-before-last's rows."""
    from pentaho_kettle_spark.plans.kjb import run_kjb

    res = run_kjb(spark, os.path.join(FIX, "sample_job_result_rows_stale.kjb"))
    assert not res.success
    assert "consume" in res.failed_entries
    assert "copied rows" in (res.error or "")


def test_mapping_repository_by_name(spark, tmp_path):
    """rep_name sub-transformation references resolve against a Kettle FILE
    repository (a directory tree of .ktr files) passed as
    run_ktr(repository=...); without it the reference raises, and rep_ref
    object ids always raise."""
    import shutil

    import pytest as _pytest

    repo = tmp_path / "repo" / "pipelines" / "fees"
    repo.mkdir(parents=True)
    shutil.copy(os.path.join(FIX, "child_mapping.ktr"), repo / "child_mapping.ktr")

    out = run_ktr(
        spark,
        os.path.join(FIX, "parent_mapping_repo.ktr"),
        repository=str(tmp_path / "repo"),
    )["Apply fee mapping"]
    row = out.first()
    # child computes PERCENT_3: amt + amt * rate / 100
    assert row.order_fee == 200.0 + 200.0 * 10.0 / 100.0
    # rename_on_output=Y reverted the child-side names
    assert "amount" in out.columns and "amt" not in out.columns

    with _pytest.raises(NotImplementedError, match="repository-by-name"):
        run_ktr(spark, os.path.join(FIX, "parent_mapping_repo.ktr"))


def test_job_trans_repository_by_name(spark, tmp_path):
    """A job TRANS entry referencing <transname>/<directory> runs the .ktr
    from the file repository passed to run_kjb(repository=...)."""
    import shutil

    from pentaho_kettle_spark.plans.kjb import run_kjb

    repo = tmp_path / "repo" / "pipelines" / "fees"
    repo.mkdir(parents=True)
    # any self-contained fixture works as the repo-resident transformation
    shutil.copy(os.path.join(FIX, "sample_shaping.ktr"), repo / "fee_rollup.ktr")

    res = run_kjb(
        spark,
        os.path.join(FIX, "sample_job_repo.kjb"),
        repository=str(tmp_path / "repo"),
    )
    assert res.success, res.error
    assert "run repo trans" in res.results
