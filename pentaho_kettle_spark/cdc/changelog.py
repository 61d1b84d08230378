"""Change-log source: schema + readers (batch parquet, streaming file source).

The change log is the binlog/WAL analog of Kettle's Merge Rows (diff) output
stream (mergerows/MergeRows.java flags {identical,changed,new,deleted} →
here ops {I,U,D}, SURVEY §2.4 / §1.4): an ordered stream of change events
with a globally monotonic `seq`, full after-images for I/U, keys-only for D.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("ingest_ts", T.TimestampType(), True),
    ]
)


def read_changelog(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of a parquet change log. Schema is asserted, not inferred."""
    return spark.read.schema(CHANGELOG_SCHEMA).parquet(path)


def read_changelog_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Structured Streaming file source over a changelog directory.

    At production scale this would be Kafka (`format("kafka")` + from_json of
    the Debezium-style envelope); the file source exercises the identical
    downstream pipeline — checkpointed offsets, foreachBatch apply — and is
    what the sandbox supports.
    """
    reader = spark.readStream.schema(CHANGELOG_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)
