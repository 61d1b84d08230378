"""Property-based fuzz of patch_apply's column-LWW contract.

With in-order delivery (the documented contract: patch semantics are
defined relative to apply order, like Hudi's partial-update payload), any
interleaving of sparse patches and row deletes, in any batching, must equal
a trivially-correct sequential oracle that applies one event at a time:

  * a patch beats the stored version iff its (ts, seq) is greater;
  * a winning patch writes its non-null columns and inherits the rest from
    the stored row iff that row is LIVE — never through a tombstone;
  * a delete tombstones the key (later patches resurrect with only their
    own columns).

Hypothesis explores key counts, column-subset patterns, delete placement,
and batch boundaries; the engine folds each batch column-wise before one
merge, which must be indistinguishable from the event-at-a-time oracle.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.types as T
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pentaho_kettle_spark.tableio.parquet_snapshot import ParquetSnapshotTableIO

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
PAYLOAD = ["role", "text", "tool"]
_T0 = dt.datetime(2026, 1, 1)


def _ts(i: int) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=i)


# one event: a patch (non-empty column subset) or a delete, on one key
event = st.fixed_dictionaries(
    {
        "key": st.integers(0, 5),
        "kind": st.sampled_from(["patch", "patch", "patch", "delete"]),
        "cols": st.sets(st.sampled_from(PAYLOAD), min_size=1),
        "val": st.integers(0, 99),
    }
)


def _oracle(events):
    """Sequential event-at-a-time apply; returns {key: visible row dict}."""
    state: dict[int, dict] = {}
    for i, e in enumerate(events):
        k = e["key"]
        cur = state.get(k)
        # events are generated in-order: (ts, seq) strictly increases with i,
        # so every event beats the stored version and the LWW gate is about
        # batching equivalence, not reordering
        if e["kind"] == "delete":
            if cur is not None:
                state[k] = {"live": False}
            continue
        vals = {c: f"v{e['val']}" for c in e["cols"]}
        if cur is not None and cur.get("live"):
            row = {c: vals.get(c, cur.get(c)) for c in PAYLOAD}
        else:
            row = {c: vals.get(c) for c in PAYLOAD}
        row["live"] = True
        row["ts"] = _ts(i)
        state[k] = row
    return {k: v for k, v in state.items() if v.get("live")}


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(event, min_size=1, max_size=14),
    batch_at=st.sets(st.integers(1, 13)),  # batch boundaries between events
)
def test_patch_batching_equals_sequential_oracle(
    spark, tmp_path_factory, events, batch_at
):
    root = str(tmp_path_factory.mktemp("patchprop") / "t")
    t = ParquetSnapshotTableIO(
        spark, root, key_cols=("conv_id", "turn_idx"), n_buckets=2,
        write_mode="mor", compact_delta_files=None,
    )
    t.init_empty(SCHEMA)

    def flush(patch_rows, bid):
        if patch_rows:
            df = spark.createDataFrame(
                patch_rows,
                "conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp, _seq long",
            )
            t.patch_apply(df, batch_id=f"p{bid}")

    pending: list = []
    bid = 0
    for i, e in enumerate(events):
        if i in batch_at:
            flush(pending, bid)
            pending, bid = [], bid + 1
        key = (f"c{e['key']}", e["key"])
        if e["kind"] == "delete":
            # deletes ride the normal merge path between patch batches
            flush(pending, bid)
            pending, bid = [], bid + 1
            ddf = spark.createDataFrame(
                [(*key, None, None, None, _ts(i), "D", i)],
                "conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp, op string, _seq long",
            )
            t.merge_apply(ddf, batch_id=f"d{i}")
        else:
            vals = {c: f"v{e['val']}" for c in e["cols"]}
            pending.append(
                (*key, vals.get("role"), vals.get("text"), vals.get("tool"),
                 _ts(i), i)
            )
    flush(pending, bid)

    want = _oracle(events)
    got = {
        r["turn_idx"]: {c: r[c] for c in PAYLOAD} | {"ts": r["ts"]}
        for r in t.read().collect()
    }
    assert set(got) == set(want)
    for k, row in want.items():
        assert got[k] == {c: row.get(c) for c in PAYLOAD} | {"ts": row["ts"]}, k
