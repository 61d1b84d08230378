from pentaho_kettle_spark.fixtures.changelog_gen import (  # noqa: F401
    TRANSCRIPT_COLUMNS,
    gen_changelog,
    pandas_oracle_apply,
)
