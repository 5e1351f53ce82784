"""Control plane: TOML config parsing + changefeed registry lifecycle,
large-message handling, active-active transforms."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from ticdc_spark.codec import encode_canal_json
from ticdc_spark.config import parse_changefeed_config
from ticdc_spark.operators.active_active import (
    deletes_to_soft_deletes,
    soft_deletes_to_deletes,
)
from ticdc_spark.operators.large_message import apply_handle_key_only, with_claim_check
from ticdc_spark.sources.changelog import events_changelog
from ticdc_spark.streaming.registry import ChangefeedRegistry

REFERENCE_TOML = """
[filter]
rules = ['*.*', '!test.tp_view']

[[filter.event-filters]]
matcher = ['test.tp_click']
ignore-event = ['update']

[[filter.event-filters]]
matcher = ['test.tp_*']
ignore-insert-value-expr = 'val > 195.0'

[sink]
protocol = "canal-json"
only-output-updated-columns = true

[[sink.column-selectors]]
matcher = ['test.tp_signup']
columns = ['id', 'val']

[[sink.dispatchers]]
matcher = ['test.tp_*']
partition = "index-value"
topic = "cdc_{schema}_{table}"
"""


def test_toml_config_parses_reference_field_names():
    cfg = parse_changefeed_config(REFERENCE_TOML)
    assert cfg.filter_rules == ["*.*", "!test.tp_view"]
    assert cfg.event_filters == [
        {"matcher": ["test.tp_click"], "ignore-event": ["update"]}
    ]
    assert cfg.expr_filter == {
        "matcher": ["test.tp_*"], "ignore-insert-value-expr": "val > 195.0"
    }
    assert cfg.column_selectors[0]["columns"] == ["id", "val"]
    assert cfg.dispatchers[0]["partition"] == "index-value"
    assert cfg.protocol == "canal-json"
    assert cfg.only_output_updated_columns is True


def test_registry_lifecycle(spark, sf_dir, tmp_path):
    reg = ChangefeedRegistry(str(tmp_path))
    reg.create("cf1", REFERENCE_TOML)
    assert reg.list() == {"cf1": "normal"}
    reg.run("cf1", spark, sf_dir, timeout_s=240)
    cf = reg.get("cf1")
    out = spark.read.json(f"{cf.sink_dir}/epoch=*")
    assert out.count() > 0
    # tp_view filtered out by rules; tp_click updates dropped
    topics = {r["topic"] for r in out.select("topic").distinct().collect()}
    assert "cdc_test_tp_view" not in topics
    reg.pause("cf1")
    assert reg.list()["cf1"] == "stopped"
    reg.resume("cf1")
    reg.remove("cf1")
    assert reg.list()["cf1"] == "removed"


def test_handle_key_only_fallback(spark, sf_dir):
    from ticdc_spark.operators.projections import delete_handle_key_only

    cl = events_changelog(spark, sf_dir).limit(200)
    encoded = encode_canal_json(cl)

    def small(df):
        # handle-key-only: strip BOTH images to pk columns then re-encode
        stripped = df
        for img in ("before", "after"):
            stripped = stripped.withColumn(
                img,
                F.when(
                    F.col(img).isNotNull(),
                    F.struct(
                        F.col(f"{img}.id").alias("id"),
                        F.lit(None).cast("double").alias("val"),
                        F.lit(None).cast("long").alias("k"),
                    ),
                ),
            )
        return encode_canal_json(stripped)

    out = apply_handle_key_only(encoded, small, max_bytes=260)
    rows = out.select("is_large", F.length("value").alias("len"), "value").collect()
    assert any(r["is_large"] for r in rows), "fixture produced no large messages"
    for r in rows:
        if r["is_large"]:
            assert '"val":null' in r["value"]


def test_claim_check(spark, sf_dir):
    cl = events_changelog(spark, sf_dir).limit(100)
    out = with_claim_check(encode_canal_json(cl), max_bytes=260)
    rows = out.collect()
    large = [r for r in rows if r["is_large"]]
    assert large
    for r in large:
        assert r["value"].startswith('{"claimCheckLocation":"s3://claims/')
        assert r["claim_location"] in r["value"]


def test_active_active_round_trip(spark, sf_dir):
    cl = events_changelog(spark, sf_dir).limit(300)
    soft = deletes_to_soft_deletes(cl)
    assert soft.filter(F.col("op") == "D").count() == 0
    assert soft.filter(F.col("soft_delete") & F.col("after").isNull()).count() == 0
    back = soft_deletes_to_deletes(soft)
    # round trip restores the original op multiset
    orig = {(r["seq"], r["op"]) for r in cl.select("seq", "op").collect()}
    rt = {(r["seq"], r["op"]) for r in back.select("seq", "op").collect()}
    assert orig == rt


def test_pipeline_all_protocols_and_knobs(spark, sf_dir):
    """Every protocol in the sink enum compiles and encodes through
    build_pipeline; large-message modes and compression compose on top;
    unknown names raise."""
    import pytest

    from ticdc_spark.pipeline import ENCODERS, ChangefeedConfig, build_pipeline
    from ticdc_spark.sources.changelog import events_changelog

    cl = events_changelog(spark, sf_dir).limit(200)
    for proto in sorted(ENCODERS):
        out = build_pipeline(cl, ChangefeedConfig(protocol=proto))
        n = out.filter(out["value"].isNotNull()).count()
        assert n > 0, proto
    # handle-key-only: oversized rows shrink to pk-only messages
    out = build_pipeline(cl, ChangefeedConfig(
        protocol="canal-json",
        large_message_handle={"large-message-handle-option": "handle-key-only",
                              "max-message-bytes": 280},
    ))
    rows = out.select("is_large", "value").collect()
    assert any(r["is_large"] for r in rows)
    for r in rows:
        if r["is_large"]:
            assert '"val"' not in r["value"]  # non-key columns stripped
    # claim-check: pointers replace oversized payloads
    out = build_pipeline(cl, ChangefeedConfig(
        protocol="canal-json",
        large_message_handle={"large-message-handle-option": "claim-check",
                              "max-message-bytes": 280},
    ))
    assert out.filter(out["value"].contains("claimCheckLocation")).count() > 0
    # compression composes at the very end
    out = build_pipeline(cl, ChangefeedConfig(protocol="csv", compression="zlib"))
    assert dict(out.dtypes)["value"] == "binary"
    assert out.count() >= 200  # update-split expands key-changing updates
    with pytest.raises(ValueError):
        build_pipeline(cl, ChangefeedConfig(protocol="no-such-protocol"))
    with pytest.raises(ValueError):
        build_pipeline(cl, ChangefeedConfig(
            large_message_handle={"large-message-handle-option": "bogus"}))
