"""avro encoder (SURVEY §2.11) — JSON encoding + gated binary path.

Reference: `pkg/sink/codec/avro/arvo.go:267-601` — per-table Avro
schemas with union types; schema-registry integration.

This container has no spark-avro jar, so the default output is the
**Avro JSON encoding** (spec §JSON Encoding: union values appear as
``{"branch": value}``, e.g. ``{"long": 5}`` / ``null``) — deterministic
strings, oracle-checkable, and exactly what a schema-registry debug
consumer shows. When the jar is present (`try_to_avro`), the same
record column feeds ``to_avro`` for the binary wire path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType, StringType, StructType

from ticdc_spark.functions.render import json_escape

_AVRO_BRANCH = {"long": "long", "bigint": "long", "double": "double", "string": "string"}


def _union_value(col: Column, dtype) -> Column:
    if isinstance(dtype, (DoubleType, FloatType)):
        # Avro JSON prints doubles; pin %.2f for cross-engine determinism.
        rendered = F.when(col.isNotNull(), F.format_string("%.2f", col))
    elif isinstance(dtype, StringType):
        rendered = F.when(
            col.isNotNull(), F.concat(F.lit('"'), json_escape(col), F.lit('"'))
        )
    else:
        rendered = col.cast("string")
    branch = _AVRO_BRANCH[dtype.simpleString()]
    return F.when(
        col.isNotNull(),
        F.concat(F.lit('{"' + branch + '":'), rendered, F.lit("}")),
    ).otherwise(F.lit("null"))


def _record_json(image: str, schema: StructType) -> Column:
    parts: list[Column] = [F.lit("{")]
    for i, f in enumerate(schema.fields):
        if i:
            parts.append(F.lit(","))
        parts.append(F.lit(f'"{f.name}":'))
        parts.append(_union_value(F.col(f"{image}.{f.name}"), f.dataType))
    parts.append(F.lit("}"))
    return F.when(F.col(image).isNotNull(), F.concat(*parts)).otherwise(F.lit("null"))


def encode_avro_json(cl: DataFrame) -> DataFrame:
    """Avro JSON-encoded value: the row record + op/commitTs metadata
    fields (mirroring the reference's tidbOp/commitTs extension fields)."""
    schema: StructType = cl.schema["after"].dataType
    value = F.concat(
        F.lit('{"op":"'),
        F.col("op"),
        F.lit('","commitTs":'),
        F.col("commit_ts").cast("string"),
        F.lit(',"before":'),
        _record_json("before", schema),
        F.lit(',"after":'),
        _record_json("after", schema),
        F.lit("}"),
    )
    return cl.withColumn("value", value)


def try_to_avro(cl: DataFrame, column: str = "after"):
    """Binary Avro via spark-avro when the jar is on the classpath."""
    try:
        from pyspark.sql.avro.functions import to_avro

        out = cl.withColumn("value", to_avro(F.col(column)))
        out.limit(1).collect()  # force resolution; raises if jar absent
        return out
    except Exception:
        return None


# -- schema-registry documents ----------------------------------------------
_SPARK_TO_AVRO = {
    "long": "long", "bigint": "long", "int": "int", "integer": "int",
    "double": "double", "float": "float", "string": "string",
    "binary": "bytes", "date": "int", "boolean": "boolean",
}


def avro_schema_document(
    schema_name: str,
    table_name: str,
    payload: StructType,
    mysql_types: dict[str, str],
    pk_fields: tuple[str, ...] = ("id",),
    keyspace: str = "default",
) -> list[dict]:
    """The Confluent-registry documents the avro encoder registers per
    table (`avro/arvo.go:352-407` columns2AvroSchema + subjects
    `helper.go:27-28,143`): one ``<topic>-value`` record over all
    columns and one ``<topic>-key`` record over the handle key. Handle
    columns are NOT NULL (direct type); others are ``["null", T]`` with
    ``default: null``; every leaf carries
    ``connect.parameters.tidb_type`` (`helper.go:106-109,32`).

    Plan-time metadata, computed once per (table, schema version) on
    the driver — exactly the cardinality the reference's registry calls
    have; nothing per-row."""
    import json

    def field(f):
        leaf = {
            "type": _SPARK_TO_AVRO[f.dataType.simpleString()],
            "connect.parameters": {
                "tidb_type": mysql_types[f.name].upper()
            },
        }
        if f.name in pk_fields:
            return {"name": f.name, "type": leaf}
        return {"name": f.name, "type": ["null", leaf], "default": None}

    topic = f"cdc_{schema_name}_{table_name}"
    namespace = f"{keyspace}.{schema_name}"
    docs = []
    for suffix, fields in (
        ("-value", list(payload.fields)),
        ("-key", [f for f in payload.fields if f.name in pk_fields]),
    ):
        body = {
            "type": "record",
            "name": table_name,
            "namespace": namespace,
            "fields": [field(f) for f in fields],
        }
        docs.append({
            "subject": topic + suffix,
            "schema_json": json.dumps(body, separators=(",", ":")),
        })
    return docs
