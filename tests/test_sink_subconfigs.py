"""[sink.kafka-config] / [sink.pulsar-config] / [sink.mysql-config]
TOML sections + the reference's sink-URI params for SASL and the MySQL
sink knobs (`pkg/config/sink.go`, `pkg/sink/kafka/options.go:123-135`,
`pkg/security/sasl.go:43-58`, `pkg/sink/mysql/config.go:277-283,
624-700`), ending in a live SASL handshake driven purely from parsed
changefeed config."""

from __future__ import annotations

import pytest

from ticdc_spark.config import (
    kafka_sasl,
    parse_changefeed_config,
    pulsar_auth,
)


def test_kafka_config_toml_section_parses():
    cfg = parse_changefeed_config(
        'sink-uri = "kafka://b:9092/t"\n'
        "[sink.kafka-config]\n"
        'sasl-mechanism = "scram-sha-256"\n'
        'sasl-user = "alice"\n'
        'sasl-password = "pw"\n'
        'kafka-version = "3.6.0"\n')
    assert cfg.kafka_config["kafka-version"] == "3.6.0"
    assert kafka_sasl(cfg) == ("SCRAM-SHA-256", "alice", "pw")


def test_uri_params_override_toml_section():
    cfg = parse_changefeed_config(
        'sink-uri = "kafka://b:9092/t?sasl-user=bob&sasl-mechanism=plain"\n'
        "[sink.kafka-config]\n"
        'sasl-mechanism = "scram-sha-256"\n'
        'sasl-user = "alice"\n'
        'sasl-password = "pw"\n')
    # URI wins per-key; untouched keys survive from TOML
    assert kafka_sasl(cfg) == ("PLAIN", "bob", "pw")


def test_unknown_sasl_mechanism_rejected():
    with pytest.raises(ValueError, match="unknown oauth SASL mechanism"):
        parse_changefeed_config(
            'sink-uri = "kafka://b:9092/t?sasl-mechanism=oauth"\n')


def test_no_sasl_returns_none():
    cfg = parse_changefeed_config('sink-uri = "kafka://b:9092/t"\n')
    assert kafka_sasl(cfg) is None


def test_mysql_uri_knobs():
    cfg = parse_changefeed_config(
        'sink-uri = "mysql://u:p@h:4000/?read-timeout=2m&timeout=30s'
        '&tidb-txn-mode=optimistic&time-zone=UTC"\n')
    mc = cfg.mysql_config
    assert mc["read-timeout"] == "2m"
    assert mc["timeout"] == "30s"
    assert mc["tidb-txn-mode"] == "optimistic"
    assert mc["time-zone"] == "UTC"


def test_mysql_invalid_txn_mode_keeps_default():
    # reference WARNS and keeps the default (`config.go:624-636`)
    cfg = parse_changefeed_config(
        'sink-uri = "mysql://u:p@h:4000/?tidb-txn-mode=serializable"\n')
    assert "tidb-txn-mode" not in (cfg.mysql_config or {})


def test_mysql_bad_duration_raises():
    with pytest.raises(ValueError, match="bad duration"):
        parse_changefeed_config(
            'sink-uri = "mysql://u:p@h:4000/?write-timeout=fast"\n')


def test_mysql_config_toml_section_parses():
    cfg = parse_changefeed_config(
        'sink-uri = "mysql://u:p@h:4000/"\n'
        "[sink.mysql-config]\n"
        "enable-batch-dml = true\n"
        'tidb-txn-mode = "pessimistic"\n')
    assert cfg.mysql_config["enable-batch-dml"] is True
    assert cfg.mysql_config["tidb-txn-mode"] == "pessimistic"


def test_pulsar_auth_token_and_oauth(tmp_path):
    cfg = parse_changefeed_config(
        'sink-uri = "pulsar://h:6650/t"\n'
        "[sink.pulsar-config]\n"
        'authentication-token = "tok123"\n')
    assert pulsar_auth(cfg) == {"token": "tok123"}
    p = tmp_path / "tok.txt"
    p.write_text("fromfile\n")
    cfg2 = parse_changefeed_config(
        'sink-uri = "pulsar://h:6650/t"\n'
        "[sink.pulsar-config]\n"
        f'token-from-file = "{p}"\n')
    assert pulsar_auth(cfg2) == {"token": "fromfile"}
    cfg3 = parse_changefeed_config(
        'sink-uri = "pulsar://h:6650/t"\n'
        "[sink.pulsar-config.oauth2]\n"
        'oauth2-issuer-url = "https://issuer.local"\n'
        'oauth2-client-id = "cid"\n'
        'oauth2-audience = "aud"\n')
    assert pulsar_auth(cfg3)["oauth2"]["issuer_url"] == "https://issuer.local"
    assert pulsar_auth(cfg3)["oauth2"]["client_id"] == "cid"


def test_live_sasl_plain_from_parsed_config():
    """TOML+URI -> kafka_sasl -> real SASL PLAIN handshake + roundtrip."""
    from ticdc_spark.codec.kafka_wire import Record
    from ticdc_spark.sinks.kafka_broker import KafkaBroker
    from ticdc_spark.sinks.kafka_client import KafkaConn

    with KafkaBroker(sasl_users={"alice": "pw"}) as b:
        cfg = parse_changefeed_config(
            f'sink-uri = "kafka://{b.bootstrap}/t?sasl-mechanism=plain"\n'
            "[sink.kafka-config]\n"
            'sasl-user = "alice"\n'
            'sasl-password = "pw"\n')
        with KafkaConn.from_bootstrap(b.bootstrap,
                                      sasl=kafka_sasl(cfg)) as c:
            c.produce("t", 0, [Record(b"k", b"v")])
            assert len(c.fetch_all("t", 0)) == 1
        # wrong password from config must be refused by the broker
        bad = parse_changefeed_config(
            f'sink-uri = "kafka://{b.bootstrap}/t?sasl-mechanism=plain'
            '&sasl-password=nope"\n'
            "[sink.kafka-config]\n"
            'sasl-user = "alice"\n')
        with pytest.raises(Exception, match="[Aa]uth"):
            KafkaConn.from_bootstrap(b.bootstrap, sasl=kafka_sasl(bad))
