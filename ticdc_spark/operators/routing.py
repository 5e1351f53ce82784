"""R1-R6 — event router: topic templating + partitioners.

Reference: `downstreamadapter/sink/eventrouter/event_router.go:28-158` —
first-match dispatch rules `{Matcher, PartitionRule, TopicRule,
TargetSchema, TargetTable}` (`pkg/config/sink.go:409-429`); topic grammar
``[prefix]{schema}[mid]{table}[suffix]``
(`eventrouter/topic/expression.go:27-104`); partitioners:
``default``/``table`` (hash of schema.table, `partition/table.go:25-38`),
``ts`` (`partition/ts.go:24-31`), ``index-value`` (hash of handle values,
`partition/index_value.go:28-42`), ``columns`` (`partition/columns.go:29-44`),
``rowid``/``key`` (`partition/key.go:21-31`).

Spark-first: routing is two derived columns (``topic``,``partition``) —
metadata-only column algebra. ``index-value`` preserves per-key ordering
because equal keys map to equal partitions (the ordering-critical
property called out in the reference).

Portability note: hash-based partitioners use a 32-bit FNV-1a over the
rendered key string (md5-derived, see hash32_md5), implemented portably —
identical results in Spark and any ANSI engine (the oracle), unlike
murmur3 ``F.hash`` which is Spark-private.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ticdc_spark.operators.table_filter import table_filter_predicate

_FNV_OFFSET = 2166136261
_FNV_PRIME = 16777619
_M32 = 4294967296  # 2^32


def fnv1a32(col: Column, max_len: int = 64) -> Column:
    """32-bit FNV-1a over a string column (higher-order fold).

    NOTE: ``F.aggregate`` is CodegenFallback — fine inside already-
    interpreted stages (simhash), but hot routing paths use
    ``hash32_md5`` below, which stays in whole-stage codegen.
    """
    chars = F.slice(F.split(col, ""), 1, max_len)
    return F.aggregate(
        chars,
        F.lit(_FNV_OFFSET).cast("long"),
        lambda acc, ch: ((acc.bitwiseXOR(F.ascii(ch))) * _FNV_PRIME) % _M32,
    )


def hash32_md5(col: Column) -> Column:
    """Portable 32-bit hash: first 8 hex digits of md5. Natively
    codegen'd in Spark (conv+md5); DuckDB: ``('0x'||substr(md5(x),1,8))::
    BIGINT``. Used by every hash partitioner/slot so the routing+encode
    Project stays inside whole-stage codegen."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def sanitize_topic(col: Column) -> Column:
    """Kafka topic charset sanitization: anything outside [a-zA-Z0-9._-]
    becomes '_' (`eventrouter/topic/expression.go:27-104`)."""
    return F.regexp_replace(col, "[^a-zA-Z0-9._-]", "_")


def topic_expr(template: str, default_schema_col: str = "schema_name") -> Column:
    """Render ``{schema}``/``{table}`` templates, e.g. ``cdc_{schema}_{table}``."""
    parts: list[Column] = []
    buf = ""
    i = 0
    while i < len(template):
        if template.startswith("{schema}", i):
            if buf:
                parts.append(F.lit(buf)); buf = ""
            parts.append(F.col(default_schema_col))
            i += len("{schema}")
        elif template.startswith("{table}", i):
            if buf:
                parts.append(F.lit(buf)); buf = ""
            parts.append(F.col("table_name"))
            i += len("{table}")
        else:
            buf += template[i]; i += 1
    if buf:
        parts.append(F.lit(buf))
    return F.concat(*parts)


def _partition_expr(rule: str, n: int, columns: list[str] | None = None,
                    hasher: str = "md5") -> Column:
    """``hasher="inertia"`` selects the reference's byte-exact
    PositionInertia hash (crc32-IEEE XOR-fold per Write,
    `pkg/hash/position_inertia.go`, fed per `partition/*.go`) —
    partition numbers then match the reference for identical rows.
    ``md5`` is the engine default (same JVM-codegen class, DuckDB-
    portable without the recursive-CTE crc oracle)."""
    if hasher == "inertia":
        return _inertia_partition_expr(rule, n, columns)
    key: Column
    if rule in ("default", "table"):
        key = hash32_md5(F.concat_ws(".", F.col("schema_name"), F.col("table_name")))
    elif rule == "ts":
        return (F.col("commit_ts") % n).cast("int")
    elif rule == "index-value":
        key = hash32_md5(
            F.coalesce(F.col("after.id"), F.col("before.id")).cast("string")
        )
    elif rule == "columns":
        cols = [F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}")).cast("string")
                for c in (columns or [])]
        key = hash32_md5(F.concat_ws(",", *cols))
    elif rule in ("rowid", "key"):
        key = hash32_md5(F.col("pk").cast("string"))
    else:
        raise ValueError(f"unknown partition rule: {rule}")
    return (key % n).cast("int")


def _inertia_partition_expr(rule: str, n: int,
                            columns: list[str] | None = None) -> Column:
    from ticdc_spark.functions.crc32_sql import position_inertia

    tbl_write = F.concat("schema_name", "table_name")
    if rule in ("default", "table"):
        h = position_inertia(tbl_write)  # partition/table.go:48
    elif rule == "ts":
        return (F.col("commit_ts") % n).cast("int")
    elif rule in ("index-value", "columns", "rowid", "key"):
        # index_value.go / columns.go: Write(schema, table) then one
        # Write(colName, value) per column, nulls skipped
        if rule == "index-value":
            pairs = [("id", F.coalesce(F.col("after.id"),
                                       F.col("before.id")).cast("string"))]
        elif rule == "columns":
            pairs = [(c, F.coalesce(F.col(f"after.{c}"),
                                    F.col(f"before.{c}")).cast("string"))
                     for c in (columns or [])]
        else:
            pairs = [("pk", F.col("pk").cast("string"))]
        h = position_inertia(tbl_write)
        for name, val in pairs:
            h_col = position_inertia(F.concat(F.lit(name), val))
            h = F.when(val.isNull(), h).otherwise(h.bitwiseXOR(h_col))
    else:
        raise ValueError(f"unknown partition rule: {rule}")
    return (h % n).cast("int")


PARTITIONERS = ("default", "table", "ts", "index-value", "columns", "rowid", "key")


_ROUTING_EXPR_RE = __import__("re").compile(r"^(?:[^{}]|\{schema\}|\{table\})*$")


def validate_routing_expression(field: str, expr: str) -> None:
    """Mirror of `pkg/config/sink.go:1177-1188`: target expressions may
    contain only literal text, {schema}, and {table}."""
    if expr and not _ROUTING_EXPR_RE.match(expr):
        raise ValueError(
            f"{field} {expr!r} must contain only literal text, "
            "{schema}, and {table}"
        )


def apply_table_route(cl: DataFrame, rules: list[dict]) -> DataFrame:
    """Table routing (R1 rename): rewrite schema_name/table_name per
    first-matching rule's ``target-schema``/``target-table`` templates
    (`pkg/config/sink.go:408-440`). Matchers test the UPSTREAM names;
    both templates render from the upstream names too — so the rewrite
    is a single ``select`` (a withColumn chain would leak the renamed
    schema into the table template)."""
    for r in rules:
        validate_routing_expression("target-schema", r.get("target-schema", ""))
        validate_routing_expression("target-table", r.get("target-table", ""))
    new_schema: Column = F.col("schema_name")
    new_table: Column = F.col("table_name")
    for r in reversed(rules):  # fold so the first matching rule wins
        cond = table_filter_predicate(r.get("matcher", ["*.*"]))
        if r.get("target-schema"):
            new_schema = F.when(cond, topic_expr(r["target-schema"])).otherwise(new_schema)
        if r.get("target-table"):
            new_table = F.when(cond, topic_expr(r["target-table"])).otherwise(new_table)
    others = [c for c in cl.columns if c not in ("schema_name", "table_name")]
    return cl.select(
        new_schema.alias("schema_name"), new_table.alias("table_name"), *others
    )


def route(cl: DataFrame, dispatchers: list[dict], n_partitions: int = 16) -> DataFrame:
    """dispatchers: [{"matcher": [...], "partition": rule, "topic": tmpl,
    "columns": [...]}] — first match wins (event_router.go:28-158)."""
    topic: Column = F.concat_ws(".", F.col("schema_name"), F.col("table_name"))
    part: Column = _partition_expr("default", n_partitions)
    for d in reversed(dispatchers):  # fold so the first matching rule wins
        cond = table_filter_predicate(d.get("matcher", ["*.*"]))
        if d.get("topic"):
            topic = F.when(cond, topic_expr(d["topic"])).otherwise(topic)
        if d.get("partition"):
            part = F.when(
                cond, _partition_expr(d["partition"], n_partitions,
                                      d.get("columns"),
                                      d.get("hasher", "md5"))
            ).otherwise(part)
    return cl.withColumn("topic", topic).withColumn("partition", part)


def route_bindings_asof(cl, bindings):
    """Versioned route bindings (`pkg/routing/admin.go:147-197` +
    `registry.go`): a route transition admitted at a DDL's commit ts
    governs every event at-or-after that ts, in commit order — the
    routing twin of the schema as-of join (J1).

    ``bindings``: DataFrame (src_schema, src_table, tgt_schema,
    tgt_table, effective_ts).  Events resolve the binding with the
    largest ``effective_ts <= commit_ts`` via an intervalized
    broadcast join (each transition governs until the next one) — one
    interval matches per event, so the event stream never shuffles;
    unbound tables keep their identity."""
    from pyspark.sql import Window

    # intervalize each table's transition history: binding i governs
    # [effective_ts, next transition) — the broadcast join then matches
    # AT MOST ONE interval per event, so no per-event aggregate (and no
    # shuffle of the event stream) is needed.  The window runs over the
    # bindings table only: control-plane metadata, rows = n_transitions.
    w = Window.partitionBy("src_schema", "src_table").orderBy("effective_ts")
    intervals = bindings.withColumn(
        "_end_ts",
        F.coalesce(F.lead("effective_ts").over(w),
                   F.lit((1 << 62))),
    )
    b = F.broadcast(intervals.select(
        F.col("src_schema").alias("_bs"),
        F.col("src_table").alias("_bt"),
        "tgt_schema", "tgt_table", "effective_ts", "_end_ts",
    ))
    # the as-of condition lives IN the join clause: an event earlier
    # than its table's first transition must keep its row (identity
    # routing), not be filtered away
    j = cl.join(
        b,
        (F.col("schema_name") == F.col("_bs"))
        & (F.col("table_name") == F.col("_bt"))
        & (F.col("effective_ts") <= F.col("commit_ts"))
        & (F.col("commit_ts") < F.col("_end_ts")),
        "left",
    )
    keys = [c for c in cl.columns]
    return j.select(
        *keys,
        F.coalesce("tgt_schema", F.col("schema_name")).alias("target_schema"),
        F.coalesce("tgt_table", F.col("table_name")).alias("target_table"),
    )
