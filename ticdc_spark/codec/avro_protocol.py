"""Native ``avro`` protocol — per-table Confluent-binary messages.

Reference: `pkg/sink/codec/avro/arvo.go` (BatchEncoder) + `helper.go`.
The JSON-encoding twin stays in `codec/avro_codec.py` (it predates this
module and remains the registered debug representation); this module is
the real wire shape:

- value schema (`columns2AvroSchema` :352-406): record named
  ``SanitizeName(table)`` in namespace
  ``SanitizeName(keyspace).SanitizeName(schema)`` (`helper.go:162-169`);
  each column an avro primitive carrying ``connect.parameters:
  {tidb_type: ...}`` (`columnToAvroSchema` :478-...; BIGINT→long,
  DOUBLE→double, INT→int, unsigned BIGINT→string under the string
  handling mode); nullable columns union as ``["null", T]`` with
  ``default: null`` when the column has no default, else ``[T,"null"]``
  with the default (`:386-402`).
- TiDB extension fields appended when enable-tidb-extension
  (`schemaWithExtension` :210-235): ``_tidb_op`` ("c"/"u"/"" —
  `helper.go:44-45,147-154`), ``_tidb_commit_ts``,
  ``_tidb_commit_physical_time`` (TSO physical millis).
- key = the handle columns through the same schema builder, subject
  ``<topic>-key`` (`encodeKey` :82-126).
- DELETE value (`encodeValue` :128-141): a Kafka tombstone (None)
  unless enable-tidb-extension AND avro-enable-watermark, in which
  case the 9-byte ``deleteByte(3) | commitTs u64 BE`` marker.
- envelope = confluent header + avro binary (`toEnvelope` :709-720).
"""

from __future__ import annotations

import json

from ticdc_spark.codec.debezium_avro import (
    avro_decode,
    avro_encode,
    compile_avro_decoder,
    compile_avro_encoder,
    sanitize_name,
)

_ = (avro_decode, avro_encode)  # re-exported reference interpreters

# compiled encoders keyed by schema-dict identity (sound because the
# entry holds a strong ref to the schema, so its id cannot be reused
# while the entry lives; the memoized default-column schemas above are
# stable objects, customs recompile after an eviction)
_ENCODER_MEMO: dict = {}


def _compiled_encoder(schema: dict):
    hit = _ENCODER_MEMO.get(id(schema))
    if hit is not None and hit[0] is schema:
        return hit[1]
    enc = compile_avro_encoder(schema, {})
    if len(_ENCODER_MEMO) > 1024:
        _ENCODER_MEMO.clear()
    _ENCODER_MEMO[id(schema)] = (schema, enc)
    return enc

TIDB_OP = "_tidb_op"
TIDB_COMMIT_TS = "_tidb_commit_ts"
TIDB_PHYSICAL_TIME = "_tidb_commit_physical_time"
DELETE_BYTE = 3

# canonical changelog payload column meta (id is the clustered handle)
PAYLOAD_AVRO_COLUMNS = (
    {"name": "id", "avro": "long", "tidb_type": "BIGINT",
     "not_null": True, "handle": True},
    {"name": "val", "avro": "double", "tidb_type": "DOUBLE"},
    {"name": "k", "avro": "long", "tidb_type": "BIGINT"},
)


def avro_namespace(keyspace: str, schema: str) -> str:
    ns = sanitize_name(keyspace)
    s = sanitize_name(schema)
    return f"{ns}.{s}" if s else ns


def _column_field(col: dict) -> dict:
    """columnToAvroSchema + the nullable/default union rules
    (`arvo.go:352-406`).  Column meta keys: ``avro`` (primitive type),
    ``tidb_type``, optional ``params`` (extra connect.parameters —
    enum/set "allowed", bit "length"), optional ``decimal``
    (precision, scale) → the decimal logical type, ``not_null``,
    ``default``, ``handle``."""
    params = {"tidb_type": col["tidb_type"]}
    params.update(col.get("params") or {})
    typ: dict = {"type": col["avro"], "connect.parameters": params}
    logical = "decimal" in col
    if logical:
        prec, scale = col["decimal"]
        typ.update({"logicalType": "decimal", "precision": prec,
                    "scale": scale})
    field: dict = {"name": sanitize_name(col["name"])}
    if logical:
        # goavro can't set defaults on logical types (arvo.go:379-388)
        if col.get("not_null"):
            field["type"] = typ
        else:
            field["type"] = ["null", typ]
            field["default"] = None
        return field
    if col.get("not_null"):
        field["type"] = typ
        if col.get("default") is not None:
            field["default"] = col["default"]
    elif col.get("default") is None:
        field["type"] = ["null", typ]
        field["default"] = None
    else:
        field["type"] = [typ, "null"]
        field["default"] = col["default"]
    return field


# columnToAvroSchema's full type table (`arvo.go:478-608`) as column
# meta builders — avro type + tidb_type + extra parameters per family.
def mysql_col(name: str, mysql_type: str, not_null: bool = False,
              handle: bool = False, default=None, unsigned: bool = False,
              binary: bool = False, elems: list | None = None,
              flen: int = -1, decimal: int = -1,
              decimal_mode: str = "precise",
              bigint_unsigned_mode: str = "long") -> dict:
    t = mysql_type.lower()
    base = {"name": name, "not_null": not_null, "handle": handle,
            "default": default}
    if t in ("tinyint", "smallint", "mediumint"):
        return {**base, "avro": "int",
                "tidb_type": "INT UNSIGNED" if unsigned else "INT"}
    if t == "int":
        return {**base, "avro": "long" if unsigned else "int",
                "tidb_type": "INT UNSIGNED" if unsigned else "INT"}
    if t == "bigint":
        avro = "long"
        if unsigned and bigint_unsigned_mode == "string":
            avro = "string"
        return {**base, "avro": avro,
                "tidb_type": "BIGINT UNSIGNED" if unsigned else "BIGINT"}
    if t == "float":
        return {**base, "avro": "float", "tidb_type": "FLOAT"}
    if t == "double":
        return {**base, "avro": "double", "tidb_type": "DOUBLE"}
    if t == "bit":
        return {**base, "avro": "bytes", "tidb_type": "BIT",
                "params": {"length": str(flen if flen != -1 else 1)}}
    if t == "decimal":
        if decimal_mode != "precise":
            return {**base, "avro": "string", "tidb_type": "DECIMAL"}
        return {**base, "avro": "bytes", "tidb_type": "DECIMAL",
                "decimal": (flen if flen != -1 else 10,
                            decimal if decimal != -1 else 0)}
    if t in ("varchar", "char", "text", "tinytext", "mediumtext",
             "longtext", "binary", "varbinary", "blob", "tinyblob",
             "mediumblob", "longblob"):
        tt = "BLOB" if binary else "TEXT"
        return {**base, "avro": "bytes" if binary else "string",
                "tidb_type": tt}
    if t in ("enum", "set"):
        return {**base, "avro": "string", "tidb_type": t.upper(),
                "params": {"allowed": ",".join(elems or [])}}
    if t == "json":
        return {**base, "avro": "string", "tidb_type": "JSON"}
    if t in ("date", "datetime", "timestamp"):
        return {**base, "avro": "string", "tidb_type": t.upper()}
    if t == "time":  # mysql.TypeDuration
        return {**base, "avro": "string", "tidb_type": "TIME"}
    if t == "year":
        return {**base, "avro": "int", "tidb_type": "YEAR"}
    if t == "vector":
        return {**base, "avro": "string", "tidb_type": "TiDBVECTORFloat32"}
    raise ValueError(f"unknown mysql type: {mysql_type}")


# the per-row encoders below rebuild these schema dicts on every call
# (guide §4.5: heavyweight init per row); the dicts are pure functions
# of their arguments, so memoize the DEFAULT-columns shape — column
# tuples are dicts (unhashable), so the cache keys on the module
# default by identity and custom column sets fall through to a rebuild.
# FROZEN CONTRACT: table_value_schema/table_key_schema return the
# memoized dict ITSELF — callers must treat it as immutable (mutating
# it would corrupt every later encode of that table).  Callers that
# need to extend a schema must copy.deepcopy it first.
_SCHEMA_MEMO: dict = {}


def table_value_schema(schema_name: str, table_name: str,
                       columns=PAYLOAD_AVRO_COLUMNS,
                       tidb_extension: bool = True,
                       keyspace: str = "default") -> dict:
    memo_key = None
    if columns is PAYLOAD_AVRO_COLUMNS:
        memo_key = ("v", schema_name, table_name, tidb_extension, keyspace)
        got = _SCHEMA_MEMO.get(memo_key)
        if got is not None:
            return got
    top = {
        "type": "record",
        "name": sanitize_name(table_name),
        "namespace": avro_namespace(keyspace, schema_name),
        "fields": [_column_field(c) for c in columns],
    }
    if tidb_extension:
        top["fields"] += [
            {"name": TIDB_OP, "type": "string", "default": ""},
            {"name": TIDB_COMMIT_TS, "type": "long", "default": 0},
            {"name": TIDB_PHYSICAL_TIME, "type": "long", "default": 0},
        ]
    if memo_key is not None:
        _SCHEMA_MEMO[memo_key] = top
    return top


def table_key_schema(schema_name: str, table_name: str,
                     columns=PAYLOAD_AVRO_COLUMNS,
                     keyspace: str = "default") -> dict:
    memo_key = None
    if columns is PAYLOAD_AVRO_COLUMNS:
        memo_key = ("k", schema_name, table_name, keyspace)
        got = _SCHEMA_MEMO.get(memo_key)
        if got is not None:
            return got
    out = {
        "type": "record",
        "name": sanitize_name(table_name),
        "namespace": avro_namespace(keyspace, schema_name),
        "fields": [_column_field(c) for c in columns
                   if c.get("handle")],
    }
    if memo_key is not None:
        _SCHEMA_MEMO[memo_key] = out
    return out


def _register(mgr, subject: str, schema: dict, version: int = 1) -> bytes:
    _, header = mgr.get_cached_or_register(
        subject, version, lambda: json.dumps(schema,
                                             separators=(",", ":")))
    return header


def encode_row_value(mgr, topic: str, schema_name: str, table_name: str,
                     row: dict, op: str, commit_ts: int,
                     columns=PAYLOAD_AVRO_COLUMNS,
                     tidb_extension: bool = True,
                     avro_enable_watermark: bool = False,
                     keyspace: str = "default") -> bytes | None:
    """encodeValue: confluent-framed record for I/U; delete marker or
    tombstone (None) for D."""
    if op == "D":
        if not (tidb_extension and avro_enable_watermark):
            return None  # Kafka tombstone
        return bytes([DELETE_BYTE]) + int(commit_ts).to_bytes(8, "big")
    schema = table_value_schema(schema_name, table_name, columns,
                                tidb_extension, keyspace)
    header = _register(mgr, topic + "-value", schema)
    native = {sanitize_name(c["name"]): row.get(c["name"])
              for c in columns}
    if tidb_extension:
        native[TIDB_OP] = "c" if op == "I" else "u"
        native[TIDB_COMMIT_TS] = int(commit_ts)
        # oracle.ExtractPhysical: TSO physical millis = ts >> 18
        native[TIDB_PHYSICAL_TIME] = int(commit_ts) >> 18
    return header + _compiled_encoder(schema)(native)


def encode_row_key(mgr, topic: str, schema_name: str, table_name: str,
                   row: dict, columns=PAYLOAD_AVRO_COLUMNS,
                   keyspace: str = "default") -> bytes:
    schema = table_key_schema(schema_name, table_name, columns, keyspace)
    header = _register(mgr, topic + "-key", schema)
    native = {sanitize_name(c["name"]): row.get(c["name"])
              for c in columns if c.get("handle")}
    return header + _compiled_encoder(schema)(native)


def decode_message(mgr, subject: str, data: bytes) -> dict | None:
    """Registry-driven decode: header id → schema → native record.
    Returns None for a tombstone; the 9-byte delete marker decodes to
    ``{"_delete_commit_ts": ts}``."""
    if data is None:
        return None
    if len(data) == 9 and data[0] == DELETE_BYTE:
        return {"_delete_commit_ts": int.from_bytes(data[1:], "big")}
    if len(data) < 5 or data[0] != 0:
        raise ValueError("bad confluent envelope")
    schema_id = int.from_bytes(data[1:5], "big")
    parsed = getattr(mgr, "_parsed_schemas", None)
    if parsed is None:
        parsed = mgr._parsed_schemas = {}
    dec = parsed.get(schema_id)
    if dec is None:
        schema = json.loads(mgr.lookup(subject, schema_id))
        dec = parsed[schema_id] = compile_avro_decoder(schema, {})
    native, pos = dec(data, 5)
    if pos != len(data):
        raise ValueError(f"trailing bytes: {len(data) - pos}")
    return native


def encode_avro_binary_df(cl, tidb_extension: bool = True,
                          avro_enable_watermark: bool = False,
                          keyspace: str = "default"):
    """DataFrame encoder (ENCODERS["avro-confluent"]): binary key/value
    columns; Arrow-batched, per-batch in-memory registry (deployments
    swap in the REST/Glue managers from codec/schema_registry.py)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    names = [c["name"] for c in PAYLOAD_AVRO_COLUMNS]

    def _make(mode: str):
        def conv(schema_name, table_name, op, commit_ts, c_id, c_val,
                 c_k):
            from ticdc_spark.codec.schema_registry import (
                ConfluentSchemaManager,
                InMemoryConfluentRegistry,
                InMemoryTransport,
            )

            mgr = ConfluentSchemaManager(
                "http://registry.local",
                transport=InMemoryTransport(InMemoryConfluentRegistry()))
            # plain lists once per batch instead of .iloc per cell —
            # the 14 Series.iloc calls per row otherwise cost more than
            # the avro encode itself (guide §4.2: keep the per-row loop
            # over native containers)
            sn_l, tn_l = schema_name.tolist(), table_name.tolist()
            op_l, cts_l = op.tolist(), commit_ts.tolist()
            cols_l = [c.tolist() for c in (c_id, c_val, c_k)]
            out = []
            for i in range(len(op_l)):
                row = {}
                for j, n in enumerate(names):
                    v = cols_l[j][i]
                    row[n] = None if pd.isna(v) else (
                        float(v) if n == "val" else int(v))
                topic = f"{sn_l[i]}.{tn_l[i]}"
                if mode == "key":
                    out.append(encode_row_key(
                        mgr, topic, sn_l[i],
                        tn_l[i], row, keyspace=keyspace))
                else:
                    out.append(encode_row_value(
                        mgr, topic, sn_l[i],
                        tn_l[i], row, op_l[i],
                        int(cts_l[i]),
                        tidb_extension=tidb_extension,
                        avro_enable_watermark=avro_enable_watermark,
                        keyspace=keyspace))
            return pd.Series(out, dtype=object)

        conv.__annotations__ = {
            k: pd.Series for k in
            ["schema_name", "table_name", "op", "commit_ts",
             "c_id", "c_val", "c_k", "return"]}
        return pandas_udf(conv, "binary")

    # key uses the pre-image for deletes; value uses the after image
    img_key = F.when(F.col("op") == "D", F.col("before")) \
        .otherwise(F.col("after"))
    key_args = [F.col("schema_name"), F.col("table_name"), F.col("op"),
                F.col("commit_ts")] + [img_key.getField(n) for n in names]
    val_args = [F.col("schema_name"), F.col("table_name"), F.col("op"),
                F.col("commit_ts")] + [F.col("after").getField(n)
                                       for n in names]
    return (cl.withColumn("key", _make("key")(*key_args))
            .withColumn("value", _make("value")(*val_args)))


# -- non-row events (`encoder.go:105-147`): magic-byte framed ----------------
DDL_BYTE = 1
CHECKPOINT_BYTE = 2


def encode_checkpoint(ts: int, tidb_extension: bool = True,
                      avro_enable_watermark: bool = True) -> bytes | None:
    """EncodeCheckpointEvent: ``checkpointByte(2) | ts u64 BE`` when
    extension+watermark are on, else nothing (nil message)."""
    if not (tidb_extension and avro_enable_watermark):
        return None
    return bytes([CHECKPOINT_BYTE]) + int(ts).to_bytes(8, "big")


def encode_ddl(query: str, action_type: int, schema: str, table: str,
               commit_ts: int, tidb_extension: bool = True,
               avro_enable_watermark: bool = True) -> bytes | None:
    """EncodeDDLEvent: ``ddlByte(1)`` + the ddlEvent JSON doc
    (query/type/schema/table/commitTs — `helper.go:91-97` field
    order)."""
    if not (tidb_extension and avro_enable_watermark):
        return None
    doc = json.dumps({"query": query, "type": action_type,
                      "schema": schema, "table": table,
                      "commitTs": commit_ts}, separators=(",", ":"))
    return bytes([DDL_BYTE]) + doc.encode("utf-8")


def decode_event(data: bytes):
    """Consumer dispatch on the leading magic byte (confluent 0, ddl 1,
    checkpoint 2, delete 3)."""
    if not data:
        return ("tombstone", None)
    if data[0] == DDL_BYTE:
        return ("ddl", json.loads(data[1:].decode("utf-8")))
    if data[0] == CHECKPOINT_BYTE:
        return ("checkpoint", int.from_bytes(data[1:9], "big"))
    if data[0] == DELETE_BYTE and len(data) == 9:
        return ("delete", int.from_bytes(data[1:9], "big"))
    if data[0] == 0:
        return ("row", data)
    raise ValueError(f"unknown avro event magic: {data[0]:#x}")
