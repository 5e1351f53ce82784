"""Default-value parity with the reference's defaultReplicaConfig
(`pkg/config/replica_config.go:51-130`) — a user who writes an empty
TOML must get the same effective changefeed the reference would build.
Every row cites the reference definition."""

from __future__ import annotations

from ticdc_spark.config import parse_changefeed_config, parse_duration_us


def test_empty_toml_matches_reference_defaults():
    cfg = parse_changefeed_config("")
    # (value, reference citation)
    expected = {
        # server.go:45 DefaultChangefeedMemoryQuota = 1 GiB
        "memory_quota": 1024 * 1024 * 1024,
        # replica_config.go:54 CaseSensitive=false
        "case_sensitive": False,
        # replica_config.go:57 EnableSyncPoint=false
        "enable_sync_point": False,
        # replica_config.go:59 SyncPointInterval=10m
        "sync_point_interval_us": 10 * 60 * 1_000_000,
        # replica_config.go:60 SyncPointRetention=24h
        "sync_point_retention_us": 24 * 3600 * 1_000_000,
        # replica_config.go:61 BDRMode=false
        "bdr_mode": False,
        # sink.go:60 CRLF terminator (replica_config.go:76)
        "terminator": "\r\n",
        # replica_config.go:77 DateSeparator=day
        "date_separator": "day",
        # replica_config.go:79-80 OnlyOutputUpdatedColumns /
        # DeleteOnlyOutputHandleKeyColumns = false
        "only_output_updated_columns": False,
        "delete_only_output_handle_key": False,
        # sink.go:68-73 DefaultFileIndexWidth=20
        "file_index_width": 20,
        # integrity defaults: CheckLevelNone (replica_config.go:121)
        "integrity_check_level": "none",
        # scheduler block (replica_config.go:107-118)
        "enable_table_across_nodes": False,
        "region_threshold": 10_000,
        "write_key_threshold": 0,
        # filter.go NewDefaultFilterConfig: rules=['*.*']
        "filter_rules": ["*.*"],
        # force-replicate defaults false (changefeed.go ForceReplicate)
        "force_replicate": False,
    }
    for attr, want in expected.items():
        got = getattr(cfg, attr)
        assert got == want, f"{attr}: {got!r} != reference default {want!r}"


def test_scheduler_region_threshold_not_legacy_value():
    """Guard against regressing to the legacy 100k threshold — the
    reference splits tables at 10k regions (`replica_config.go:109`)."""
    cfg = parse_changefeed_config("[scheduler]\n")
    assert cfg.region_threshold == 10_000


def test_explicit_values_override_defaults():
    cfg = parse_changefeed_config(
        """
memory-quota = 2147483648
enable-sync-point = true
sync-point-interval = "30s"
sync-point-retention = "1h"
[sink]
terminator = "\\n"
date-separator = "month"
file-index-width = 8
[scheduler]
enable-table-across-nodes = true
region-threshold = 777
"""
    )
    assert cfg.memory_quota == 2 * 1024 ** 3
    assert cfg.enable_sync_point is True
    assert cfg.sync_point_interval_us == parse_duration_us("30s")
    assert cfg.sync_point_retention_us == parse_duration_us("1h")
    assert cfg.terminator == "\n"
    assert cfg.date_separator == "month"
    assert cfg.file_index_width == 8
    assert cfg.enable_table_across_nodes is True
    assert cfg.region_threshold == 777


def test_csv_defaults_match_reference_constants():
    """CSVConfig defaults (`replica_config.go:68-73`): quote '\"',
    delimiter ',', null '\\N', binary-encoding base64 — the csv codec's
    built-in defaults must agree."""
    import inspect

    from ticdc_spark.codec import csv_codec

    sig = inspect.signature(csv_codec.encode_csv)
    assert sig.parameters["binary_encoding"].default == "base64"
    # module constants used as encode defaults
    assert csv_codec._QUOTE == '"'
    assert csv_codec._DELIM == ","
    assert csv_codec.NULL_TOKEN == "\\N"


def test_sink_uri_query_params():
    """Sink URIs configure the sink through query params like the
    reference (`pkg/sink/mysql/config.go:529-676`, kafka options.go
    form tags); modeled params fold into the config, unknown params are
    ignored, invalid values refuse."""
    import pytest as _pytest

    kafka = parse_changefeed_config(
        'sink-uri = "kafka://b:9092/topic?protocol=open-protocol'
        '&partition-num=6&max-message-bytes=1048576&compression=zstd'
        '&enable-tidb-extension=true&unknown-knob=whatever"')
    assert kafka.protocol == "open-protocol"
    assert kafka.n_partitions == 6
    assert kafka.max_message_bytes == 1 << 20
    assert kafka.compression == "zstd"
    assert kafka.tidb_extension is True

    my = parse_changefeed_config(
        'sink-uri = "mysql://u:p@h:4000/?safe-mode=true'
        '&worker-count=9999&max-txn-row=64&transaction-atomicity=table"')
    assert my.safe_mode is True
    assert my.worker_count == 1024  # clamped at maxWorkerCount
    assert my.max_txn_row == 64
    assert my.transaction_atomicity == "table"

    for bad in ("partition-num=0", "worker-count=-3", "max-txn-row=abc"):
        with _pytest.raises(ValueError):
            parse_changefeed_config(f'sink-uri = "kafka://b/t?{bad}"')


def test_sink_uri_params_apply_on_create_override(tmp_path):
    """registry.create's sink_uri argument overrides the TOML URI; its
    query params must win too."""
    from ticdc_spark.streaming.registry import ChangefeedRegistry

    reg = ChangefeedRegistry(str(tmp_path))
    cf = reg.create("cf-uri-params", "",
                    sink_uri="mysql://h:4000/?safe-mode=true&max-txn-row=8")
    assert cf.cfg.safe_mode is True and cf.cfg.max_txn_row == 8
    # rebuild from persisted state keeps them
    reg._live.clear()
    cf2 = reg.get("cf-uri-params")
    assert cf2.cfg.safe_mode is True and cf2.cfg.max_txn_row == 8
