"""debezium envelope encoder (SURVEY §2.11).

Reference: `pkg/sink/codec/debezium/encoder.go` / `codec.go` — the
standard Debezium envelope ``{"before":…, "after":…, "source":{…},
"op":"c|u|d", "ts_ms":…}``; source carries connector/db/table metadata.

Deterministic concat assembly; ``ts_ms`` = commit ts millis (processing
time fields pinned to 0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ticdc_spark.functions.render import json_number, json_string_or_null
from pyspark.sql.types import DoubleType, FloatType, StringType


def _image_obj(image: str, schema: StructType) -> Column:
    parts: list[Column] = [F.lit("{")]
    for i, f in enumerate(schema.fields):
        if i:
            parts.append(F.lit(","))
        parts.append(F.lit(f'"{f.name}":'))
        if isinstance(f.dataType, (StringType, DoubleType, FloatType)):
            # Debezium renders doubles as JSON numbers; we pin the float
            # format via the canonical renderer for determinism.
            parts.append(json_string_or_null(F.col(f"{image}.{f.name}"), f.dataType)
                         if isinstance(f.dataType, StringType)
                         else json_number(F.round(F.col(f"{image}.{f.name}"), 2)))
        else:
            parts.append(json_number(F.col(f"{image}.{f.name}")))
    parts.append(F.lit("}"))
    return F.when(F.col(image).isNotNull(), F.concat(*parts)).otherwise(F.lit("null"))


def encode_debezium(cl: DataFrame, connector: str = "ticdc-spark") -> DataFrame:
    schema: StructType = cl.schema["after"].dataType
    dbz_op = (
        F.when(F.col("op") == "I", F.lit("c"))
        .when(F.col("op") == "U", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    source = F.concat(
        F.lit('{"connector":"' + connector + '","db":"'),
        F.col("schema_name"),
        F.lit('","table":"'),
        F.col("table_name"),
        F.lit('","commit_ts":'),
        F.col("commit_ts").cast("string"),
        F.lit("}"),
    )
    value = F.concat(
        F.lit('{"before":'),
        _image_obj("before", schema),
        F.lit(',"after":'),
        _image_obj("after", schema),
        F.lit(',"source":'),
        source,
        F.lit(',"op":"'),
        dbz_op,
        F.lit('","ts_ms":'),
        F.expr("commit_ts div 1000").cast("string"),
        F.lit("}"),
    )
    return cl.withColumn("value", value)


# Debezium schema-change type per `debezium/codec.go:1237-1275`
# (keyed by our classifier labels).
DBZ_DDL_TYPE = {
    "create-table": "CREATE", "create-schema": "CREATE",
    "add-column": "ALTER", "drop-column": "ALTER", "alter-table": "ALTER",
    "add-index": "ALTER", "rename-table": "ALTER",
    "drop-table": "DROP", "drop-index": "DROP", "truncate-table": "DROP",
    "drop-schema": "DROP",
}


def encode_debezium_ddl(ddl: DataFrame, connector: str = "ticdc-spark") -> DataFrame:
    """Debezium schema-change event (`codec.go:1224-1380` EncodeDDLEvent):
    key = SchemaChangeKey (payload.databaseName), value = payload with
    source block, ``databaseName``/``ddl``/``tableChanges`` — type
    CREATE/ALTER/DROP per the reference's action mapping; TRUNCATE emits
    an empty tableChanges array, DROP TABLE a null table descriptor.
    (The per-column ``table`` descriptor is carried by the simple
    protocol's TableSchema / avro registry docs in this engine.)"""
    change_type = F.lit("ALTER")
    for label, name in DBZ_DDL_TYPE.items():
        change_type = F.when(F.col("ddl_type") == label, F.lit(name)).otherwise(
            change_type
        )
    key = F.concat(
        F.lit('{"payload":{"databaseName":"'),
        F.col("schema_name"),
        F.lit('"}}'),
    )
    tid = F.concat(F.lit('\\"'), F.col("schema_name"), F.lit('\\".\\"'),
                   F.col("table_name"), F.lit('\\"'))
    table_changes = (
        F.when(F.col("ddl_type") == "truncate-table", F.lit("[]"))
        .when(
            F.col("ddl_type") == "drop-table",
            F.concat(F.lit('[{"type":"DROP","id":"'), tid,
                     F.lit('","table":null}]')),
        )
        .otherwise(
            F.concat(F.lit('[{"type":"'), change_type, F.lit('","id":"'), tid,
                     F.lit('"}]'))
        )
    )
    value = F.concat(
        F.lit('{"payload":{"source":{"connector":"' + connector + '","db":"'),
        F.col("schema_name"),
        F.lit('","table":"'),
        F.col("table_name"),
        F.lit('","commit_ts":'),
        F.col("commit_ts").cast("string"),
        F.lit('},"ts_ms":'),
        F.expr("commit_ts div 1000").cast("string"),
        F.lit(',"databaseName":"'),
        F.col("schema_name"),
        F.lit('","schemaName":null,"ddl":"'),
        F.col("query"),
        F.lit('","tableChanges":'),
        table_changes,
        F.lit("}}"),
    )
    return ddl.withColumn("key", key).withColumn("value", value)
