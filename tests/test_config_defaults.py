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
