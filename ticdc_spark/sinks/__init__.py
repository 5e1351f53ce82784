from ticdc_spark.sinks.mysql import sql_for_rows, materialize_state  # noqa: F401
from ticdc_spark.sinks.storage import storage_paths  # noqa: F401
from ticdc_spark.sinks.kafka import kafka_messages  # noqa: F401
