from pentaho_kettle_spark.streaming.ingest import start_cdc_ingest  # noqa: F401
