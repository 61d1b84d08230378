"""M3: Structured Streaming ingest — checkpointed offsets, foreachBatch
merge-apply, kill/resume, duplicate-epoch safety. Final state must equal the
sequential pandas oracle regardless of how the stream was chopped."""

from __future__ import annotations

import pyspark.sql.types as T

from pentaho_kettle_spark.cdc.changelog import CHANGELOG_SCHEMA
from pentaho_kettle_spark.fixtures.changelog_gen import gen_changelog, pandas_oracle_apply
from pentaho_kettle_spark.streaming.ingest import start_cdc_ingest
from pentaho_kettle_spark.tableio.parquet_snapshot import ParquetSnapshotTableIO
from tests.conftest import assert_df_equals_pandas

N_EVENTS, N_CONVS = 6_000, 300


def _write_chunks(spark, pdf, path, n_chunks, start=0, end=None):
    end = end if end is not None else n_chunks
    size = (len(pdf) + n_chunks - 1) // n_chunks
    for i in range(start, end):
        chunk = pdf.iloc[i * size : (i + 1) * size]
        if len(chunk) == 0:
            continue
        sdf = spark.createDataFrame(chunk, schema=CHANGELOG_SCHEMA)
        sdf.coalesce(1).write.mode("append").parquet(path)


def _fresh_table(spark, tmp_path):
    table = ParquetSnapshotTableIO(spark, str(tmp_path / "transcripts"), n_buckets=8)
    data_schema = T.StructType(
        [f for f in CHANGELOG_SCHEMA.fields if f.name not in ("seq", "op", "ingest_ts")]
    )
    table.init_empty(data_schema)
    return table


def test_stream_ingest_matches_oracle_and_resumes(spark, tmp_path):
    pdf = gen_changelog(N_EVENTS, N_CONVS, seed=11)
    oracle = pandas_oracle_apply(pdf)
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    table = _fresh_table(spark, tmp_path)

    # phase 1: first 3 of 6 chunks land, stream consumes them, then "crashes"
    _write_chunks(spark, pdf, src, 6, start=0, end=3)
    q = start_cdc_ingest(
        spark, src, table, ckpt, query_name="ingest-test", max_files_per_trigger=1
    )
    q.processAllAvailable()
    q.stop()
    mid_batches = len(table.committed_batches())
    assert mid_batches >= 1

    # phase 2: rest of the log lands; a NEW query resumes from the checkpoint
    _write_chunks(spark, pdf, src, 6, start=3, end=6)
    q2 = start_cdc_ingest(
        spark, src, table, ckpt, query_name="ingest-test", max_files_per_trigger=2
    )
    q2.processAllAvailable()
    q2.stop()

    assert_df_equals_pandas(table.read(), oracle, ["conv_id", "turn_idx"])
    # lineage was recorded for every applied epoch
    m = table.current_manifest()
    assert len(m["lineage"]) == len(m["committed_batches"])


def test_stream_full_replay_after_done_is_noop(spark, tmp_path):
    """Replaying the whole source with a FRESH checkpoint (forced re-delivery
    of every event) must not change the table: LWW idempotency."""
    pdf = gen_changelog(2_000, 150, seed=12)
    oracle = pandas_oracle_apply(pdf)
    src = str(tmp_path / "src")
    table = _fresh_table(spark, tmp_path)
    _write_chunks(spark, pdf, src, 3)

    q = start_cdc_ingest(spark, src, table, str(tmp_path / "ck1"), query_name="s1")
    q.processAllAvailable()
    q.stop()
    assert_df_equals_pandas(table.read(), oracle, ["conv_id", "turn_idx"])

    q2 = start_cdc_ingest(spark, src, table, str(tmp_path / "ck2"), query_name="s2")
    q2.processAllAvailable()
    q2.stop()
    assert_df_equals_pandas(table.read(), oracle, ["conv_id", "turn_idx"])
