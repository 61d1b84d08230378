from pentaho_kettle_spark.tableio.parquet_snapshot import ParquetSnapshotTableIO  # noqa: F401
from pentaho_kettle_spark.tableio.compaction import (  # noqa: F401
    CompactionPolicy,
    CompactionScheduler,
    run_compaction_cycle,
)
from pentaho_kettle_spark.tableio.bucketed import (  # noqa: F401
    colocated_join,
    plan_shuffle_count,
    write_bucketed,
)
