"""F2/F4/F7 — event-type, txn-start-ts, and SQL-regex filters.

Reference: `pkg/filter/sql_event_filter.go` + `pkg/binlog-filter/filter.go:41-90`
(ignorable event classes: insert/update/delete, DDL classes);
`pkg/filter/filter.go:244-251` (ignore-txn-start-ts);
`pkg/config/filter.go:36-47` (config surface: per-matcher rules with
``ignore-event``, ``ignore-sql``).

Each config rule becomes a Column predicate; the matcher scopes the rule
to tables via the F1 wildcard compiler. Everything stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ticdc_spark.operators.table_filter import table_filter_predicate

# Event-class name (binlog-filter vocabulary) → changelog op codes.
_EVENT_OPS = {"insert": ["I"], "update": ["U"], "delete": ["D"], "dml": ["I", "U", "D"]}


def event_filter_rule_predicate(
    matcher: list[str],
    ignore_event: list[str] | None = None,
    ignore_txn_start_ts: list[int] | None = None,
    ignore_sql: list[str] | None = None,
    query_col: str = "query",
) -> Column:
    """Boolean Column: True when the row should be DROPPED by this rule."""
    scoped = table_filter_predicate(matcher)
    drop: Column = F.lit(False)
    if ignore_event:
        ops = sorted({op for ev in ignore_event for op in _EVENT_OPS.get(ev, [])})
        if ops:
            drop = drop | F.col("op").isin(ops)
    if ignore_txn_start_ts:
        drop = drop | F.col("start_ts").isin([int(t) for t in ignore_txn_start_ts])
    if ignore_sql:
        for pat in ignore_sql:
            drop = drop | F.col(query_col).rlike(pat)
    return scoped & drop


def apply_event_filters(df: DataFrame, rules: list[dict]) -> DataFrame:
    """rules: list of dicts with keys matcher / ignore-event /
    ignore-txn-start-ts / ignore-sql (same names as the reference TOML)."""
    keep: Column = F.lit(True)
    for r in rules:
        keep = keep & ~event_filter_rule_predicate(
            r.get("matcher", ["*.*"]),
            r.get("ignore-event"),
            r.get("ignore-txn-start-ts"),
            r.get("ignore-sql"),
        )
    return df.filter(keep)
