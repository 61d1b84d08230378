"""Batch replay driver: changelog → micro-batches → collapse → MERGE.

Replays an already-landed change log (parquet) as a sequence of micro-batches
in delivery order — the batch twin of streaming/ingest.py, used by the bench
and by kill/resume tests. Exactly-once across resume comes from the table's
committed-batch manifest: re-running a replay skips batches that already
committed, and LWW makes any forced re-apply idempotent anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pentaho_kettle_spark.cdc.changelog import read_changelog
from pentaho_kettle_spark.cdc.lww import lww_collapse, lww_collapse_salted
from pentaho_kettle_spark.cdc.schema_evolution import evolve_and_conform
from pentaho_kettle_spark.tableio.parquet_snapshot import ParquetSnapshotTableIO


def replay_changelog(
    spark: SparkSession,
    table: ParquetSnapshotTableIO,
    changelog: DataFrame | str,
    n_batches: int = 1,
    salted: bool = False,
    n_salts: int = 16,
    rename_hints: dict[str, str] | None = None,
    run_id: str = "replay",
    stop_after_batch: int | None = None,
) -> list[dict]:
    """Replay the log in `n_batches` delivery-order chunks. Returns lineage
    records. `stop_after_batch` simulates a crash for resume tests."""
    if isinstance(changelog, str):
        changelog = read_changelog(spark, changelog)

    payload_cols = [c for c in changelog.columns if c not in ("ingest_ts",)]

    if n_batches <= 1:
        bounds = None
    else:
        # delivery order = ingest_ts; chunk by equi-width quantiles (one cheap
        # pass over one slim column)
        qs = [i / n_batches for i in range(1, n_batches)]
        bounds = changelog.select(
            F.percentile_approx(F.col("ingest_ts").cast("double"), qs, 10000).alias("b")
        ).collect()[0]["b"]

    lineage: list[dict] = []
    for i in range(n_batches):
        if bounds is None:
            batch = changelog
        else:
            lo = bounds[i - 1] if i > 0 else None
            hi = bounds[i] if i < n_batches - 1 else None
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (F.col("ingest_ts").cast("double") > F.lit(lo))
            if hi is not None:
                cond = cond & (F.col("ingest_ts").cast("double") <= F.lit(hi))
            batch = changelog.filter(cond)
        batch = batch.select(*payload_cols)
        rec = apply_batch(
            table,
            batch,
            batch_id=f"{run_id}-{i:05d}",
            salted=salted,
            n_salts=n_salts,
            rename_hints=rename_hints,
        )
        lineage.append(rec)
        if stop_after_batch is not None and i >= stop_after_batch:
            break
    return lineage


def apply_batch(
    table: ParquetSnapshotTableIO,
    batch: DataFrame,
    batch_id: str,
    salted: bool = False,
    n_salts: int = 16,
    rename_hints: dict[str, str] | None = None,
) -> dict:
    """The per-micro-batch stage chain (shared by batch replay + streaming):
    schema-evolve table → conform batch → LWW collapse → salted MERGE."""
    if batch_id in table.committed_batches():
        return {"skipped_duplicate_batch": batch_id}
    batch = evolve_and_conform(table, batch, rename_hints)
    collapse = lww_collapse_salted if salted else lww_collapse
    kwargs = {"n_salts": n_salts} if salted else {}
    collapsed = collapse(batch, key_cols=table.key_cols, lww_col=table.lww_col, **kwargs)
    return table.merge_apply(collapsed, batch_id=batch_id)
