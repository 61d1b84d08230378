"""Standalone replay job for the two-parallelism scaling protocol
(BASELINE.md): spark-submit --master local[N] --py-files pks.zip
bench/replay_job.py <changelog_dir> <n_batches> <salted:0|1> <out_json>.

Measures end-to-end merge-apply replay (ingest → collapse → salted MERGE →
commit) and writes {"events": E, "wall_sec": s, "events_per_sec": t}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

import pyspark.sql.types as T
from pyspark.sql import SparkSession


def main() -> None:
    changelog_dir, n_batches, salted, out_json = (
        sys.argv[1], int(sys.argv[2]), sys.argv[3] == "1", sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "mor"
    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from pentaho_kettle_spark.cdc.changelog import CHANGELOG_SCHEMA, read_changelog
    from pentaho_kettle_spark.cdc.replay import replay_changelog
    from pentaho_kettle_spark.tableio.parquet_snapshot import ParquetSnapshotTableIO

    log = read_changelog(spark, changelog_dir)
    n = log.count()

    root = tempfile.mkdtemp(prefix="pks_scale_tbl_")
    table = ParquetSnapshotTableIO(
        spark, root + "/t", n_buckets=32, write_mode=mode, compact_delta_files=4
    )
    table.init_empty(
        T.StructType(
            [f for f in CHANGELOG_SCHEMA.fields if f.name not in ("seq", "op", "ingest_ts")]
        )
    )
    t0 = time.time()
    replay_changelog(spark, table, log, n_batches=n_batches, salted=salted,
                     n_salts=16, run_id="scale")
    wall = time.time() - t0
    rows = table.read().count()
    shutil.rmtree(root, ignore_errors=True)

    spark.stop()  # REQUIRED under spark-submit: a lingering JVM would
    # contend with the next trial and wreck the measurement
    with open(out_json, "w") as f:
        json.dump(
            {
                "events": n,
                "wall_sec": round(wall, 2),
                "events_per_sec": round(n / wall, 1),
                "final_rows": rows,
                "parallelism": spark.sparkContext.defaultParallelism,
                "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
                "mode": mode,
            },
            f,
        )


if __name__ == "__main__":
    main()
