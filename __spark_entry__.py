"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship changefeed pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose each implemented operator from
SURVEY.md §2 with its DuckDB oracle (see ticdc_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ticdc_spark.pipeline import ChangefeedConfig, build_pipeline
from ticdc_spark.queries import ORACLES, QUERIES
from ticdc_spark.sources.changelog import events_changelog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full changefeed pipeline (filter → expr-filter →
    update-split → route → canal-json encode) on /root/testdata/sf0.001."""
    cl = events_changelog(spark, "/root/testdata/sf0.001")
    cfg = ChangefeedConfig(
        filter_rules=["*.*", "!test.tp_view"],
        event_filters=[{"matcher": ["test.tp_click"], "ignore-event": ["update"]}],
        expr_filter={"matcher": ["test.tp_*"], "ignore-insert-value-expr": "val > 195.0"},
        dispatchers=[
            {"matcher": ["test.tp_*"], "partition": "index-value",
             "topic": "cdc_{schema}_{table}"}
        ],
        protocol="canal-json",
    )
    return build_pipeline(cl, cfg).select(
        "schema_name", "table_name", "op", "commit_ts", "seq", "topic",
        "partition", "value",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
