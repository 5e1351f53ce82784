"""K3 — Pulsar sink shape (SURVEY §2.11).

Reference: `pkg/sink/pulsar/*` — same produce model as Kafka with
Pulsar naming: messages carry (topic, key, value); partitioning is by
key hash on the broker side, so the frame omits the partition column
and the topic gets the ``persistent://tenant/namespace/`` prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ticdc_spark.sinks.kafka import kafka_messages


def pulsar_messages(
    cl: DataFrame,
    dispatchers: list[dict],
    protocol: str = "canal-json",
    tenant_namespace: str = "public/default",
) -> DataFrame:
    frame = kafka_messages(cl, dispatchers, protocol)
    return frame.select(
        F.concat(
            F.lit(f"persistent://{tenant_namespace}/"), F.col("topic")
        ).alias("topic"),
        "key",
        "value",
    )
