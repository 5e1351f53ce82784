"""MySQL/TiDB → Spark type mapping (SURVEY §1.3).

The full scalar surface the reference's codecs convert
(`pkg/sink/codec/csv/csv_message.go:276-323`,
`pkg/sink/codec/common/java.go:70-146`,
`pkg/sink/codec/avro/arvo.go:267-601`), mapped to Spark types with the
widening rules for unsigned variants. VECTOR (TiDB's float32 vector,
`csv_message.go:323`) maps to array<float> — the column type the
similarity-search operators consume.
"""

from __future__ import annotations

from pyspark.sql import types as T

# (mysql_type, unsigned) → Spark type. Unsigned ints widen one step;
# unsigned BIGINT needs DecimalType(20,0) (avro emits string/long per
# AvroBigintUnsignedHandlingMode, pkg/sink/codec/common/config.go:65).
_BASE = {
    "tinyint": (T.ByteType(), T.ShortType()),
    "smallint": (T.ShortType(), T.IntegerType()),
    "mediumint": (T.IntegerType(), T.IntegerType()),
    "int": (T.IntegerType(), T.LongType()),
    "bigint": (T.LongType(), T.DecimalType(20, 0)),
    "float": (T.FloatType(), T.FloatType()),
    "double": (T.DoubleType(), T.DoubleType()),
    "year": (T.IntegerType(), T.IntegerType()),
    "date": (T.DateType(), T.DateType()),
    # MySQL DATETIME has no zone; TIMESTAMP is zone-aware (the mounter
    # carries tz, pkg/common/event/mounter.go:55)
    "datetime": (T.TimestampNTZType(), T.TimestampNTZType()),
    "timestamp": (T.TimestampType(), T.TimestampType()),
    # TIME renders canonical "HH:MM:SS" (csv/canal behavior)
    "time": (T.StringType(), T.StringType()),
    "char": (T.StringType(), T.StringType()),
    "varchar": (T.StringType(), T.StringType()),
    "tinytext": (T.StringType(), T.StringType()),
    "text": (T.StringType(), T.StringType()),
    "mediumtext": (T.StringType(), T.StringType()),
    "longtext": (T.StringType(), T.StringType()),
    "binary": (T.BinaryType(), T.BinaryType()),
    "varbinary": (T.BinaryType(), T.BinaryType()),
    "tinyblob": (T.BinaryType(), T.BinaryType()),
    "blob": (T.BinaryType(), T.BinaryType()),
    "mediumblob": (T.BinaryType(), T.BinaryType()),
    "longblob": (T.BinaryType(), T.BinaryType()),
    # ENUM/SET emit names (csv_message.go:301-314)
    "enum": (T.StringType(), T.StringType()),
    "set": (T.StringType(), T.StringType()),
    # BIT(n) emits uint64 (csv_message.go:315)
    "bit": (T.LongType(), T.LongType()),
    "json": (T.StringType(), T.StringType()),
    "geometry": (T.StringType(), T.StringType()),
    "vector": (T.ArrayType(T.FloatType()), T.ArrayType(T.FloatType())),
}


def mysql_type_to_spark(mysql_type: str, unsigned: bool = False,
                        precision: int | None = None,
                        scale: int | None = None) -> T.DataType:
    base = mysql_type.strip().lower()
    if base.startswith("decimal") or base.startswith("numeric") or base == "decimal":
        return T.DecimalType(precision or 10, scale or 0)
    if base not in _BASE:
        raise ValueError(f"unmapped MySQL type: {mysql_type}")
    signed_t, unsigned_t = _BASE[base]
    return unsigned_t if unsigned else signed_t


def table_info_to_struct(columns: list[dict]) -> T.StructType:
    """TableInfo-style column list → Spark StructType.

    columns: [{"name": ..., "type": "bigint", "unsigned": bool,
               "precision": int, "scale": int, "nullable": bool}]"""
    fields = []
    for c in columns:
        fields.append(
            T.StructField(
                c["name"],
                mysql_type_to_spark(
                    c["type"], c.get("unsigned", False),
                    c.get("precision"), c.get("scale"),
                ),
                c.get("nullable", True),
            )
        )
    return T.StructType(fields)
