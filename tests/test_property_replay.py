"""Property-based fuzz of the core invariant: any replay (any batching, any
write mode, salted or not, any skew/duplication/out-of-order profile) must
reconstruct exactly the pandas oracle's final table state.

The seeded example-based tests pin known-tricky profiles; hypothesis walks
the generator's parameter space for profiles nobody thought to pin —
shrinking failures down to a minimal (seed, profile, batching) triple that
reproduces deterministically (gen_changelog is pure in its arguments).
Examples are kept small (≤600 events) because each one drives a full Spark
replay; the state space being explored is the generator profile, not volume.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.types as T
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pentaho_kettle_spark.cdc.changelog import CHANGELOG_SCHEMA
from pentaho_kettle_spark.cdc.replay import replay_changelog
from pentaho_kettle_spark.fixtures.changelog_gen import (
    gen_changelog,
    pandas_oracle_apply,
)
from pentaho_kettle_spark.tableio.parquet_snapshot import ParquetSnapshotTableIO

DATA_SCHEMA = T.StructType(
    [f for f in CHANGELOG_SCHEMA.fields if f.name not in ("seq", "op", "ingest_ts")]
)

profile = st.fixed_dictionaries(
    {
        "n_events": st.integers(60, 600),
        "n_convs": st.integers(1, 40),
        "seed": st.integers(0, 2**31 - 1),
        "zipf_a": st.one_of(st.none(), st.sampled_from([1.1, 1.5, 3.0])),
        "dup_frac": st.sampled_from([0.0, 0.05, 0.3]),
        "late_frac": st.sampled_from([0.0, 0.05]),
        "ooo_window": st.sampled_from([1, 50, 10_000]),
    }
)
run_shape = st.fixed_dictionaries(
    {
        "n_batches": st.integers(1, 4),
        "salted": st.sampled_from([False, True, "auto"]),
        "write_mode": st.sampled_from(["mor", "cow"]),
    }
)


@settings(
    max_examples=6,
    deadline=None,  # Spark round-trips; wall time is not the property
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(profile=profile, shape=run_shape)
def test_any_replay_matches_sequential_oracle(spark, tmp_path_factory, profile, shape):
    pdf = gen_changelog(**profile)
    want = (
        pandas_oracle_apply(pdf)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    root = str(tmp_path_factory.mktemp("prop") / "t")
    table = ParquetSnapshotTableIO(
        spark, root, n_buckets=4, write_mode=shape["write_mode"]
    )
    table.init_empty(DATA_SCHEMA)
    log = spark.createDataFrame(pdf, schema=CHANGELOG_SCHEMA)
    replay_changelog(
        spark, table, log, n_batches=shape["n_batches"], salted=shape["salted"],
        run_id="prop",
    )
    got = (
        table.read()
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    got["ts"] = got["ts"].astype("datetime64[us]")
    want = want.copy()
    want["ts"] = want["ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )
