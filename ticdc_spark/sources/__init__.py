from ticdc_spark.sources.changelog import (  # noqa: F401
    CHANGELOG_SQL,
    events_changelog,
    read_table,
    stream_changelog,
)
