"""Sources & sinks (SURVEY §2.1) — thin, explicit wrappers over Spark readers.

The reference's hand-built parallel readers (csvinput/CsvInput.java byte-range
splits, parallelgzipcsv/, fixedinput/) collapse into Spark's split-aware file
scans; lazy conversion (STORAGE_TYPE_BINARY_STRING) is the vectorized reader.
JDBC steps (tableinput/tableoutput) map to spark.read/write.jdbc — present but
exercised only by unit-level plan checks here (no database in the sandbox).
"""

from pentaho_kettle_spark.sources.files import (  # noqa: F401
    csv_input,
    csv_output,
    fixed_input,
    json_input,
    json_lines_input,
    parquet_input,
    resolve_file_specs,
    text_file_input,
    text_file_input_csv,
)
from pentaho_kettle_spark.sources.generators import (  # noqa: F401
    data_grid,
    get_system_data,
    random_value,
    row_generator,
)

from pentaho_kettle_spark.sources.kafka import (  # noqa: F401
    parse_debezium_envelope,
    read_kafka_changelog_stream,
)
