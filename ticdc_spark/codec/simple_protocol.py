"""simple-protocol encoder + watermark messages (SURVEY §2.11, W1).

Reference: `pkg/sink/codec/simple/message.go:38-273` — self-describing
messages with types WATERMARK / BOOTSTRAP / DDL / DML (INSERT / UPDATE /
DELETE), embedding schema info; watermark messages at `message.go:42-43,
275-282` carry the resolved ts downstream.

DML message: ``{"version":1,"type":"INSERT","commitTs":…,"buildTs":0,
"schema":…,"table":…,"data":{…},"old":{…}}``; WATERMARK:
``{"version":1,"type":"WATERMARK","commitTs":…,"buildTs":0}``.
BOOTSTRAP messages (periodic schema rows, `pkg/config/sink.go:190-201`)
carry the table schema — produced per table from the registry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ticdc_spark.functions.render import json_string_or_null


def _image_obj(image: str, schema: StructType) -> Column:
    parts: list[Column] = [F.lit("{")]
    for i, f in enumerate(schema.fields):
        if i:
            parts.append(F.lit(","))
        parts.append(F.lit(f'"{f.name}":'))
        parts.append(json_string_or_null(F.col(f"{image}.{f.name}"), f.dataType))
    parts.append(F.lit("}"))
    return F.when(F.col(image).isNotNull(), F.concat(*parts)).otherwise(F.lit("null"))


def encode_simple(cl: DataFrame) -> DataFrame:
    schema: StructType = cl.schema["after"].dataType
    mtype = (
        F.when(F.col("op") == "I", F.lit("INSERT"))
        .when(F.col("op") == "U", F.lit("UPDATE"))
        .otherwise(F.lit("DELETE"))
    )
    value = F.concat(
        F.lit('{"version":1,"type":"'),
        mtype,
        F.lit('","commitTs":'),
        F.col("commit_ts").cast("string"),
        F.lit(',"buildTs":0,"schema":"'),
        F.col("schema_name"),
        F.lit('","table":"'),
        F.col("table_name"),
        F.lit('","data":'),
        F.when(F.col("op") == "D", F.lit("null")).otherwise(_image_obj("after", schema)),
        F.lit(',"old":'),
        F.when(F.col("op") == "I", F.lit("null")).otherwise(_image_obj("before", schema)),
        F.lit("}"),
    )
    return cl.withColumn("value", value)


def encode_simple_ddl(ddl: DataFrame) -> DataFrame:
    """simple-protocol DDL message (`simple/message.go:38-273`, type DDL
    with the post-DDL TableSchema embedded): input frame carries
    (schema_name, table_name, commit_ts, query, table_schema_json)."""
    value = F.concat(
        F.lit('{"version":1,"type":"DDL","commitTs":'),
        F.col("commit_ts").cast("string"),
        F.lit(',"buildTs":0,"schema":"'),
        F.col("schema_name"),
        F.lit('","table":"'),
        F.col("table_name"),
        F.lit('","sql":"'),
        F.col("query"),
        F.lit('","tableSchema":'),
        F.col("table_schema_json"),
        F.lit("}"),
    )
    return ddl.withColumn("value", value)


def watermark_messages(cl: DataFrame, interval_us: int = 3_600_000_000) -> DataFrame:
    """Per-table watermark rows at tumbling resolved-ts boundaries (W1):
    one WATERMARK message per (table, interval) carrying the max commit
    ts seen — what the sink emits when the resolved ts advances."""
    boundary = (F.col("commit_ts") - F.col("commit_ts") % interval_us) + interval_us
    wm = (
        cl.withColumn("boundary_ts", boundary)
        .groupBy("schema_name", "table_name", "boundary_ts")
        .agg(F.max("commit_ts").alias("resolved_ts"))
    )
    value = F.concat(
        F.lit('{"version":1,"type":"WATERMARK","commitTs":'),
        F.col("resolved_ts").cast("string"),
        F.lit(',"buildTs":0,"schema":"'),
        F.col("schema_name"),
        F.lit('","table":"'),
        F.col("table_name"),
        F.lit('"}'),
    )
    return wm.withColumn("value", value)
