"""§1.3 MySQL → Spark type mapping coverage."""

from pyspark.sql import types as T

from ticdc_spark.schema import mysql_type_to_spark, table_info_to_struct


def test_full_scalar_surface():
    cases = [
        ("tinyint", False, T.ByteType()),
        ("tinyint", True, T.ShortType()),
        ("int", False, T.IntegerType()),
        ("int", True, T.LongType()),
        ("bigint", False, T.LongType()),
        ("bigint", True, T.DecimalType(20, 0)),
        ("float", False, T.FloatType()),
        ("double", False, T.DoubleType()),
        ("date", False, T.DateType()),
        ("datetime", False, T.TimestampNTZType()),
        ("timestamp", False, T.TimestampType()),
        ("time", False, T.StringType()),
        ("year", False, T.IntegerType()),
        ("varchar", False, T.StringType()),
        ("longtext", False, T.StringType()),
        ("varbinary", False, T.BinaryType()),
        ("longblob", False, T.BinaryType()),
        ("enum", False, T.StringType()),
        ("set", False, T.StringType()),
        ("bit", False, T.LongType()),
        ("json", False, T.StringType()),
        ("vector", False, T.ArrayType(T.FloatType())),
    ]
    for mysql, unsigned, expected in cases:
        assert mysql_type_to_spark(mysql, unsigned) == expected, mysql


def test_decimal_precision_scale():
    assert mysql_type_to_spark("decimal", precision=10, scale=4) == T.DecimalType(10, 4)


def test_table_info_struct():
    st = table_info_to_struct([
        {"name": "id", "type": "int", "nullable": False},
        {"name": "c_dec", "type": "decimal", "precision": 10, "scale": 4},
        {"name": "c_vec", "type": "vector"},
    ])
    assert st.fieldNames() == ["id", "c_dec", "c_vec"]
    assert st["id"].nullable is False
    assert st["c_vec"].dataType == T.ArrayType(T.FloatType())


def test_unmapped_type_raises():
    import pytest

    with pytest.raises(ValueError):
        mysql_type_to_spark("polygonzzz")
