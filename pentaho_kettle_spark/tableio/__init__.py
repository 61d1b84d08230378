from pentaho_kettle_spark.tableio.parquet_snapshot import ParquetSnapshotTableIO  # noqa: F401
