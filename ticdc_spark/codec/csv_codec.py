"""csv encoder (SURVEY §2.11).

Reference: `pkg/sink/codec/csv/csv_message.go:104-246` — row layout
``[op, schema, table, commitTs, col1, col2, ...]`` where op ∈
{I,U,D}; quoting doubles the quote char; NULL renders as ``\\N``
(`pkgg/config/sink.go:278-279`); per-type rendering at
`csv_message.go:276-323`.

Update handling follows the csv protocol's "output old value" = false
default: updates emit the after image (deletes the before image).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

from ticdc_spark.functions.render import render_scalar

NULL_TOKEN = "\\N"
_DELIM = ","
_QUOTE = '"'


def _csv_field(col: Column, dtype) -> Column:
    rendered = render_scalar(col, dtype)
    if isinstance(dtype, StringType):
        quoted = F.concat(
            F.lit(_QUOTE),
            F.replace(rendered, F.lit(_QUOTE), F.lit(_QUOTE + _QUOTE)),
            F.lit(_QUOTE),
        )
        return F.coalesce(quoted, F.lit(NULL_TOKEN))
    return F.coalesce(rendered, F.lit(NULL_TOKEN))


def encode_csv(cl: DataFrame, include_commit_ts: bool = True) -> DataFrame:
    """Append a ``value`` column holding one csv line (no trailing newline)."""
    schema: StructType = cl.schema["after"].dataType
    image = F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after"))
    tmp = cl.withColumn("_img", image)
    fields: list[Column] = [
        _csv_field(F.col("op"), StringType()),
        _csv_field(F.col("schema_name"), StringType()),
        _csv_field(F.col("table_name"), StringType()),
    ]
    if include_commit_ts:
        fields.append(F.col("commit_ts").cast("string"))
    fields += [_csv_field(F.col(f"_img.{f.name}"), f.dataType) for f in schema.fields]
    return tmp.withColumn("value", F.concat_ws(_DELIM, *fields)).drop("_img")
