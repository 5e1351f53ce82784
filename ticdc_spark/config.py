"""Changefeed config parsing — TOML/JSON with the reference's field names.

Reference surface: `pkg/config/replica_config.go:151` (ReplicaConfig:
``filter``, ``sink``, ``mounter`` …), `pkg/config/sink.go:139`
(SinkConfig: ``protocol``, ``dispatchers``, ``column-selectors``,
``safe-mode``, ``only-output-updated-columns``,
``delete-only-output-handle-key``…), `pkg/config/filter.go:21-47`
(``rules``, ``event-filters`` with matcher / ignore-event /
ignore-txn-start-ts / ignore-sql / ignore-*-value-expr).

A TOML document a TiCDC user writes today compiles into the engine's
``ChangefeedConfig`` (pipeline.py) unchanged.
"""

from __future__ import annotations

import json
import tomllib

from ticdc_spark.pipeline import ChangefeedConfig


def parse_changefeed_config(text: str, fmt: str = "toml") -> ChangefeedConfig:
    doc = tomllib.loads(text) if fmt == "toml" else json.loads(text)
    filt = doc.get("filter", {})
    sink = doc.get("sink", {})

    event_filters: list[dict] = []
    expr_filter: dict | None = None
    for ef in filt.get("event-filters", []):
        expr_keys = {
            "ignore-insert-value-expr", "ignore-update-new-value-expr",
            "ignore-update-old-value-expr", "ignore-delete-value-expr",
        }
        plain = {k: v for k, v in ef.items() if k not in expr_keys}
        exprs = {k: v for k, v in ef.items() if k in expr_keys}
        if set(plain) - {"matcher"}:
            event_filters.append(plain)
        if exprs:
            expr_filter = {"matcher": ef.get("matcher", ["*.*"]), **exprs}

    column_selectors = [
        {"matcher": cs.get("matcher", ["*.*"]), "columns": cs.get("columns", [])}
        for cs in sink.get("column-selectors", [])
    ]
    dispatchers = [
        {
            "matcher": d.get("matcher", ["*.*"]),
            "partition": d.get("partition", d.get("dispatcher")),
            "topic": d.get("topic"),
            "columns": d.get("columns"),
        }
        for d in sink.get("dispatchers", [])
    ]

    return ChangefeedConfig(
        filter_rules=filt.get("rules", ["*.*"]),
        event_filters=event_filters,
        expr_filter=expr_filter,
        column_selectors=column_selectors,
        dispatchers=dispatchers,
        protocol=sink.get("protocol", "canal-json"),
        only_output_updated_columns=sink.get("only-output-updated-columns", False),
        delete_only_output_handle_key=sink.get("delete-only-output-handle-key", False),
    )
