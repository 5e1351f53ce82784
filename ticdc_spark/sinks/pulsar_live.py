"""Live Pulsar round-trip: sink frame -> binary-protocol produce -> read back.

Same composition as sinks/kafka_live.py for the Pulsar frame shape
(topic, key, value — no partition column; the key rides
MessageMetadata.partition_key exactly like the reference's Go producer
sets it for broker-side key hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LIVE_BROKERS: list = []


def start_broker():
    from ticdc_spark.sinks.pulsar_broker import PulsarBroker

    broker = PulsarBroker().start()
    _LIVE_BROKERS.append(broker)
    return broker


def start_broker_oauth2():
    """Broker + in-process OAuth2 issuer: the reference's pulsar sink
    OAuth2 block (`pkg/config/sink.go:581-597`,
    `pkg/sink/pulsar/factory.go:110-118`) — client-credentials exchange
    against the issuer, access token presented on CONNECT, broker
    verifies signature + audience.  -> (broker, oauth2_conf)."""
    from ticdc_spark.codec.oauth2 import MiniOAuth2Server
    from ticdc_spark.sinks.pulsar_broker import PulsarBroker

    audience = "urn:pulsar:cluster-a"
    issuer = MiniOAuth2Server("cdc-client", "cdc-secret",
                              jwt_secret="pulsar-oauth2-jwt",
                              audience=audience).start()
    broker = PulsarBroker(oauth2_jwt_secret="pulsar-oauth2-jwt",
                          oauth2_audience=audience).start()
    _LIVE_BROKERS.extend([issuer, broker])
    conf = {"issuer_url": issuer.token_url, "client_id": "cdc-client",
            "client_secret": "cdc-secret", "audience": audience}
    return broker, conf


def produce_frame(frame: DataFrame, service_url: str,
                  oauth2: dict | None = None,
                  batching_max_messages: int = 500,
                  **conn_kw) -> None:
    """Distributed produce: tasks register one producer per topic they see
    and send each row as a payload frame, awaiting receipts."""
    shaped = frame.select(
        "topic",
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("binary").alias("value"),
    ).repartition("topic")

    def _send(batches):
        import time as _time

        from ticdc_spark.sinks.pulsar_client import PulsarConn

        state = {"conn": None}
        producer_ids: dict[str, int] = {}
        buffers: dict[str, list] = {}
        flush_at = 2000
        max_retry = 5  # producer retry budget, kafka defaultMaxRetry parity

        def flush(topic):
            for attempt in range(max_retry + 1):
                try:
                    if state["conn"] is None:
                        state["conn"] = PulsarConn.from_service_url(
                            service_url, oauth2=oauth2, **conn_kw)
                        producer_ids.clear()  # producers die with the conn
                    pid = producer_ids.get(topic)
                    if pid is None:
                        pid = state["conn"].create_producer(topic)
                        producer_ids[topic] = pid
                    state["conn"].send_pipelined(
                        pid, buffers[topic],
                        batch_size=batching_max_messages)
                    buffers[topic] = []
                    return
                except (IOError, OSError):
                    if state["conn"] is not None:
                        state["conn"].close()
                        state["conn"] = None
                    if attempt == max_retry:
                        raise
                    _time.sleep(min(0.1 * (2 ** attempt), 2.0))

        n_sent = 0
        try:
            # Arrow/pandas batches across the boundary (guide §4.1),
            # not pickled Rows; payload tuples identical
            for pdf in batches:
                n_sent += len(pdf)
                for t, k, v in zip(pdf["topic"].tolist(),
                                   pdf["key"].tolist(),
                                   pdf["value"].tolist()):
                    buf = buffers.setdefault(t, [])
                    buf.append((bytes(v) if v is not None else b"", k))
                    if len(buf) >= flush_at:
                        flush(t)
            for topic in list(buffers):
                if buffers[topic]:
                    flush(topic)
        finally:
            if state["conn"] is not None:
                state["conn"].close()
        import pandas as _pd

        yield _pd.DataFrame({"n_sent": [n_sent]})

    shaped.mapInPandas(_send, "n_sent long").write.format("noop").mode(
        "overwrite").save()


def read_df(spark: SparkSession, service_url: str, topics: list[str],
            oauth2: dict | None = None, **conn_kw) -> DataFrame:
    """Distributed read-back: one task per topic, reader earliest->last."""
    tdf = spark.createDataFrame([(t,) for t in topics], "topic string").repartition(
        max(1, min(len(topics), 64)), "topic"
    )

    def _read(batches):
        import pandas as pd

        from ticdc_spark.sinks.pulsar_client import PulsarConn

        conn = None
        try:
            for pdf in batches:
                for topic in pdf["topic"]:
                    if conn is None:
                        conn = PulsarConn.from_service_url(
                            service_url, oauth2=oauth2, **conn_kw)
                    msgs = conn.read_all(topic)
                    # batch members share an entry id; entries must be
                    # non-decreasing and cover 0..max with no gaps
                    entries = [m["entry_id"] for m in msgs]
                    distinct = sorted(set(entries))
                    if entries != sorted(entries) or (
                        distinct and distinct != list(range(distinct[-1] + 1))
                    ):
                        raise ValueError(f"non-contiguous entries on {topic}")
                    if not msgs:
                        continue
                    yield pd.DataFrame({
                        "topic": topic,
                        "key": [m["partition_key"] for m in msgs],
                        "value": [m["payload"].decode("utf-8") for m in msgs],
                    })
        finally:
            if conn is not None:
                conn.close()

    return tdf.mapInPandas(_read, "topic string, key string, value string")


def pulsar_live_roundtrip(frame: DataFrame) -> DataFrame:
    """The roundtrip rides OAuth2 auth end-to-end: every executor task's
    connection runs its own client-credentials exchange against the
    in-process issuer, and the broker verifies signature + audience on
    every CONNECT — no unauthenticated path remains in this query."""
    spark = frame.sparkSession
    broker, oauth2 = start_broker_oauth2()
    produce_frame(frame, broker.service_url, oauth2=oauth2)
    topics = list(broker.topics)
    return read_df(spark, broker.service_url, topics, oauth2=oauth2)


def start_broker_basic(users: dict[str, str]):
    """Broker demanding basic auth (`pkg/sink/pulsar/factory.go:105-109`
    AuthenticationBasic: method "basic", data "user:password")."""
    from ticdc_spark.sinks.pulsar_broker import PulsarBroker

    broker = PulsarBroker(basic_users=users).start()
    _LIVE_BROKERS.append(broker)
    return broker


def start_broker_authtls():
    """Broker demanding mTLS *authentication* (`factory.go:122-125`
    AuthenticationTLS): mutual-TLS transport plus CONNECT method "tls"."""
    from ticdc_spark.sinks.pulsar_broker import PulsarBroker

    broker = PulsarBroker(tls=True, mutual_tls=True,
                          require_tls_auth=True).start()
    _LIVE_BROKERS.append(broker)
    return broker
