"""K2 — Kafka sink shape (SURVEY §2.11).

Reference: `pkg/sink/kafka/*` — sync/async producers with column-aware
partitioning; DDL broadcasts to all partitions. Spark's built-in kafka
writer consumes a DataFrame with (topic, key, value, partition) columns —
so the "sink" is: routing (R1-R6) + an encoder + key rendering. This
module assembles that frame; the actual ``.write.format("kafka")`` is a
one-liner the deployment adds (no broker in this container).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ticdc_spark.codec import encode_canal_json, encode_open_protocol
from ticdc_spark.codec.open_protocol import open_protocol_key
from ticdc_spark.operators.routing import route


def kafka_messages(
    cl: DataFrame,
    dispatchers: list[dict],
    protocol: str = "canal-json",
    n_partitions: int = 16,
) -> DataFrame:
    routed = route(cl, dispatchers, n_partitions)
    if protocol == "canal-json":
        enc = encode_canal_json(routed).withColumn("key", open_protocol_key())
    elif protocol == "open-protocol":
        enc = encode_open_protocol(routed)
    else:
        raise ValueError(f"unsupported kafka protocol: {protocol}")
    return enc.select("topic", "partition", "key", "value")
