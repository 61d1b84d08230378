"""pentaho_kettle_spark — a from-scratch, PySpark-native analytics & CDC engine
with the query/data-processing capabilities of Pentaho Kettle (PDI).

Reference semantics: fanyourou/pentaho-kettle (see SURVEY.md). This is NOT a
port — Kettle's row-at-a-time step graph is re-expressed as pure
``DataFrame -> DataFrame`` stage functions optimized by Catalyst, plus a
binlog/WAL-style CDC ingest engine (changelog tail → LWW collapse → salted
two-phase MERGE into an Iceberg-semantics snapshot table) per
BASELINE.json#north_rule.

Layout:
    session      SparkSession factory (UTC, AQE, Arrow on)
    types        Kettle ValueMeta type system → Spark types + lenient coercions
    operators/   Kettle step semantics as DataFrame stage functions (SURVEY §2)
    functions/   calculator function registry + text/dedup/similarity libs
    sources/     readers/writers (csv, text, fixed-width, json, parquet, ...)
    plans/       plan inspection helpers (explain, shuffle counting)
    streaming/   Structured Streaming ingest (readStream → foreachBatch)
    cdc/         changelog schema, dedupe, LWW, salting, merge-apply, lineage
    tableio/     Iceberg-semantics table IO (parquet-snapshot fallback)
    fixtures/    deterministic synthetic data generators (FIXTURES.md)
"""

__version__ = "0.1.0"
