"""M1: the minimum end-to-end slice (SURVEY §7) — generate change log →
LWW collapse → snapshot-table MERGE → read back → aggregate; every stage's
final state must match the single-threaded pandas oracle bit-for-bit
(per-turn text equality under stable (conv_id, turn_idx) ordering —
BASELINE.json#input_hint invariant)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pentaho_kettle_spark.cdc.changelog import CHANGELOG_SCHEMA
from pentaho_kettle_spark.cdc.replay import replay_changelog
from pentaho_kettle_spark.fixtures.changelog_gen import gen_changelog, pandas_oracle_apply
from pentaho_kettle_spark.tableio.parquet_snapshot import ParquetSnapshotTableIO
from tests.conftest import assert_df_equals_pandas

N_EVENTS, N_CONVS = 10_000, 500


@pytest.fixture(scope="module")
def changelog_pdf():
    return gen_changelog(N_EVENTS, N_CONVS, seed=42)


@pytest.fixture(scope="module")
def oracle_final(changelog_pdf):
    return pandas_oracle_apply(changelog_pdf)


def _fresh_table(spark, tmp_path, name="transcripts"):
    from pentaho_kettle_spark.cdc.changelog import CHANGELOG_SCHEMA
    import pyspark.sql.types as T

    table = ParquetSnapshotTableIO(spark, str(tmp_path / name), n_buckets=8)
    data_schema = T.StructType(
        [f for f in CHANGELOG_SCHEMA.fields if f.name not in ("seq", "op", "ingest_ts")]
    )
    table.init_empty(data_schema)
    return table


def _spark_changelog(spark, pdf):
    return spark.createDataFrame(pdf, schema=CHANGELOG_SCHEMA)


def test_single_batch_replay_matches_oracle(spark, tmp_path, changelog_pdf, oracle_final):
    table = _fresh_table(spark, tmp_path)
    log = _spark_changelog(spark, changelog_pdf)
    replay_changelog(spark, table, log, n_batches=1)
    assert_df_equals_pandas(table.read(), oracle_final, ["conv_id", "turn_idx"])


def test_multi_batch_replay_matches_oracle(spark, tmp_path, changelog_pdf, oracle_final):
    table = _fresh_table(spark, tmp_path)
    log = _spark_changelog(spark, changelog_pdf)
    lineage = replay_changelog(spark, table, log, n_batches=7)
    assert len(lineage) == 7
    assert_df_equals_pandas(table.read(), oracle_final, ["conv_id", "turn_idx"])


def test_salted_two_phase_matches_oracle(spark, tmp_path, changelog_pdf, oracle_final):
    table = _fresh_table(spark, tmp_path)
    log = _spark_changelog(spark, changelog_pdf)
    replay_changelog(spark, table, log, n_batches=3, salted=True, n_salts=8)
    assert_df_equals_pandas(table.read(), oracle_final, ["conv_id", "turn_idx"])


def test_reapply_is_idempotent(spark, tmp_path, changelog_pdf, oracle_final):
    """Exactly-once: re-running the whole replay (same run_id → skipped by
    manifest; different run_id → LWW no-ops) leaves the table unchanged."""
    table = _fresh_table(spark, tmp_path)
    log = _spark_changelog(spark, changelog_pdf)
    replay_changelog(spark, table, log, n_batches=4, run_id="r1")
    snap1 = table.snapshot_id()
    # same run_id: all batches skip via committed-batch manifest
    recs = replay_changelog(spark, table, log, n_batches=4, run_id="r1")
    assert all("skipped_duplicate_batch" in r for r in recs)
    assert table.snapshot_id() == snap1
    # different run_id: forced re-apply, LWW makes it a no-op on content
    replay_changelog(spark, table, log, n_batches=4, run_id="r2")
    assert_df_equals_pandas(table.read(), oracle_final, ["conv_id", "turn_idx"])


def test_resume_after_crash(spark, tmp_path, changelog_pdf, oracle_final):
    """Kill mid-replay, resume with the same run_id: committed batches skip,
    remaining batches apply, final state matches the oracle."""
    table = _fresh_table(spark, tmp_path)
    log = _spark_changelog(spark, changelog_pdf)
    replay_changelog(spark, table, log, n_batches=6, run_id="rr", stop_after_batch=2)
    assert len(table.committed_batches()) == 3
    recs = replay_changelog(spark, table, log, n_batches=6, run_id="rr")
    assert sum(1 for r in recs if "skipped_duplicate_batch" in r) == 3
    assert_df_equals_pandas(table.read(), oracle_final, ["conv_id", "turn_idx"])


def test_mor_replay_matches_oracle_with_compaction(spark, tmp_path, changelog_pdf, oracle_final):
    """Merge-on-read write mode: deltas appended per batch, auto-compaction
    folds them into base; readers see identical state to CoW / the oracle."""
    import pyspark.sql.types as T

    table = ParquetSnapshotTableIO(
        spark, str(tmp_path / "mor"), n_buckets=8, write_mode="mor", compact_delta_files=3
    )
    data_schema = T.StructType(
        [f for f in CHANGELOG_SCHEMA.fields if f.name not in ("seq", "op", "ingest_ts")]
    )
    table.init_empty(data_schema)
    log = _spark_changelog(spark, changelog_pdf)
    replay_changelog(spark, table, log, n_batches=6, run_id="mor")
    assert_df_equals_pandas(table.read(), oracle_final, ["conv_id", "turn_idx"])
    modes = [r.get("mode") for r in table.current_manifest()["lineage"]]
    assert "compact" in modes  # threshold=3 with 6 batches must have compacted
    # full compaction leaves a base-only table that still matches
    table.compact()
    assert_df_equals_pandas(table.read(), oracle_final, ["conv_id", "turn_idx"])


def test_flagship_aggregate(spark, tmp_path, changelog_pdf, oracle_final):
    """Post-merge per-conversation aggregate (scan → groupBy on the table)."""
    table = _fresh_table(spark, tmp_path)
    replay_changelog(spark, table, _spark_changelog(spark, changelog_pdf), n_batches=2)
    got = (
        table.read()
        .groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"), F.max("ts").alias("last_ts"))
    )
    want = (
        oracle_final.groupby("conv_id")
        .agg(n_turns=("turn_idx", "size"), last_ts=("ts", "max"))
        .reset_index()
    )
    assert_df_equals_pandas(got, want, ["conv_id"])
