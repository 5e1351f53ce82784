"""open-protocol encoder (SURVEY §2.11).

Reference: `pkg/sink/codec/open/message.go:28-40` — separate key and
value. Key: ``{"ts": commitTs, "scm": schema, "tbl": table, "t": 1}``
(type 1 = row change). Value: ``{"u": {col: {"t": type, "v": val}}}`` for
upsert images, ``"d"`` for delete images; per-column objects carry the
MySQL type byte.

Emitted as two string columns ``key`` and ``value`` via deterministic
concat (same rationale as canal_json.py).

MySQL type bytes (tidb mysql.Type*): LONGLONG=8, DOUBLE=5, VARCHAR=15.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ticdc_spark.functions.render import json_string_or_null

_MYSQL_TYPE_BYTE = {"long": 8, "bigint": 8, "double": 5, "string": 15}


def _image_obj(image: str, schema: StructType) -> Column:
    parts: list[Column] = [F.lit("{")]
    for i, f in enumerate(schema.fields):
        if i:
            parts.append(F.lit(","))
        tbyte = _MYSQL_TYPE_BYTE[f.dataType.simpleString()]
        parts.append(F.lit(f'"{f.name}":{{"t":{tbyte},"v":'))
        parts.append(json_string_or_null(F.col(f"{image}.{f.name}"), f.dataType))
        parts.append(F.lit("}"))
    parts.append(F.lit("}"))
    return F.when(F.col(image).isNotNull(), F.concat(*parts))


def open_protocol_key() -> Column:
    """The open-protocol message key (`open/message.go:28-40`) — also used
    as the kafka message key for other protocols."""
    return F.concat(
        F.lit('{"ts":'),
        F.col("commit_ts").cast("string"),
        F.lit(',"scm":"'),
        F.col("schema_name"),
        F.lit('","tbl":"'),
        F.col("table_name"),
        F.lit('","t":1}'),
    )


def encode_open_protocol(cl: DataFrame,
                         output_old_value: bool = True) -> DataFrame:
    """Updates carry BOTH images by default: ``"u"`` (new row) then
    ``"p"`` (pre row) per `open/codec.go:77-96` under
    ``OpenOutputOldValue`` — the reference default
    (`replica_config.go:88` OpenProtocolConfig{OutputOldValue: true}).
    ``output_old_value=False`` ([sink.open] output-old-value) drops
    ``"p"``; the consumer then reconstructs deletes-by-key only."""
    schema: StructType = cl.schema["after"].dataType
    key = open_protocol_key()
    upsert = _image_obj("after", schema)
    delete = _image_obj("before", schema)
    if output_old_value:
        update = F.concat(F.lit('{"u":'), upsert,
                          F.lit(',"p":'), delete, F.lit("}"))
    else:
        update = F.concat(F.lit('{"u":'), upsert, F.lit("}"))
    value = (
        F.when(F.col("op") == "D", F.concat(F.lit('{"d":'), delete, F.lit("}")))
        .when(F.col("op") == "U", update)
        .otherwise(F.concat(F.lit('{"u":'), upsert, F.lit("}")))
    )
    return cl.withColumn("key", key).withColumn("value", value)


def encode_open_protocol_ddl(ddl: DataFrame) -> DataFrame:
    """open-protocol DDL message (`open/codec.go:121-137`): key
    ``{"ts":finishedTs,"scm":schema,"tbl":table,"t":2}`` (type 2 = DDL),
    value ``{"q":query,"t":<tidb action type>}``. Input frame carries
    (schema_name, table_name, commit_ts, query, action_type)."""
    key = F.concat(
        F.lit('{"ts":'),
        F.col("commit_ts").cast("string"),
        F.lit(',"scm":"'),
        F.col("schema_name"),
        F.lit('","tbl":"'),
        F.col("table_name"),
        F.lit('","t":2}'),
    )
    value = F.concat(
        F.lit('{"q":"'),
        F.col("query"),
        F.lit('","t":'),
        F.col("action_type").cast("string"),
        F.lit("}"),
    )
    return ddl.withColumn("key", key).withColumn("value", value)


def open_protocol_checkpoints(cl: DataFrame, interval_us: int = 3_600_000_000) -> DataFrame:
    """open-protocol resolved-ts (checkpoint) messages
    (`open/encoder.go:240-250` EncodeCheckpointEvent): key
    ``{"ts":resolvedTs,"t":3}``, value EMPTY — one per tumbling
    resolved-ts boundary across the whole changefeed (the reference emits
    one per checkpoint advance and broadcasts it to every partition).
    Map-side partial max → single tiny final agg; no per-row state."""
    boundary = (F.col("commit_ts") - F.col("commit_ts") % interval_us) + interval_us
    wm = (
        cl.withColumn("boundary_ts", boundary)
        .groupBy("boundary_ts")
        .agg(F.max("commit_ts").alias("resolved_ts"))
    )
    key = F.concat(
        F.lit('{"ts":'), F.col("resolved_ts").cast("string"), F.lit(',"t":3}')
    )
    return wm.withColumn("key", key).withColumn("value", F.lit(""))


def encode_open_protocol_batch(cl_routed: DataFrame,
                               max_batch_size: int | None = None
                               ) -> DataFrame:
    """Batched open-protocol (``IsBatchEncode``,
    `pkg/config/sink_protocol.go:48-50`): messages for one
    (topic, partition) frame into batch payloads, ordered by
    (commit_ts, seq) — the order the consumer must replay.

    ``max_batch_size`` caps messages per batch like the encoder's
    ``max-batch-size`` (default 16, `codec/common/config.go:34-35`);
    None frames everything into one payload (flush-time capping).
    The reference frames each message with binary uint64-BE length
    headers (`open/message.go`); here the framing is decimal netstring
    (``len:key len:value``) so the bytes are reproducible in the SQL
    oracle — grouping, ordering, and framing structure are identical.
    One shuffle on (topic, partition) — the same exchange the kafka
    write needs anyway (the batch-index window rides it), so batching
    is free at scale.
    """
    from pyspark.sql.window import Window

    enc = encode_open_protocol(cl_routed)
    frame = F.concat(
        F.length("key").cast("string"), F.lit(":"), F.col("key"),
        F.length("value").cast("string"), F.lit(":"), F.col("value"),
    )
    rows = enc.select(
        "topic", "partition",
        F.struct("commit_ts", "seq", frame.alias("frame")).alias("_r"),
    )
    group_cols = ["topic", "partition"]
    if max_batch_size is not None:
        w = Window.partitionBy("topic", "partition").orderBy(
            F.col("_r.commit_ts"), F.col("_r.seq"))
        rows = rows.withColumn(
            "batch_index",
            ((F.row_number().over(w) - 1) / max_batch_size)
            .cast("long"),
        )
        group_cols.append("batch_index")
    return rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_messages"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list("_r")), lambda s: s["frame"]),
            "",
        ).alias("batch"),
    )
