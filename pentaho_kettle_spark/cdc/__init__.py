from pentaho_kettle_spark.cdc.changelog import CHANGELOG_SCHEMA, read_changelog  # noqa: F401
from pentaho_kettle_spark.cdc.lww import lww_collapse  # noqa: F401
from pentaho_kettle_spark.cdc.replay import replay_changelog  # noqa: F401
