"""Cloud-storage schema sidecar: byte-faithful SchemaFile layout and
PositionInertia filename checksum (`pkg/cloudstorage/schema_file.go`)."""

from __future__ import annotations

import binascii
import json

from ticdc_spark.sinks.storage import _go_json, schema_sidecar


def test_go_json_layout():
    got = _go_json({"Table": "t", "TableColumns": [{"ColumnName": "id"}]})
    want = (
        b'{\n'
        b'    "Table": "t",\n'
        b'    "TableColumns": [\n'
        b'        {\n'
        b'            "ColumnName": "id"\n'
        b'        }\n'
        b'    ]\n'
        b'}'
    )
    assert got == want  # Go json.MarshalIndent(v, "", "    ") layout


def test_sidecar_checksum_is_position_inertia_of_sorted_payload():
    fields = [
        {"name": "val", "type": "double", "nullable": True},
        {"name": "id", "type": "bigint", "is_pk": True},
    ]
    s = schema_sidecar("test", "tp_click", fields, table_version=42)
    # independent recomputation: columns sorted by ColumnName, Go order
    payload = {
        "Table": "tp_click",
        "Schema": "test",
        "Version": 0,
        "TableColumns": [
            {"ColumnName": "id", "ColumnType": "BIGINT",
             "ColumnIsPk": "true"},
            {"ColumnName": "val", "ColumnType": "DOUBLE",
             "ColumnNullable": "true"},
        ],
        "TableColumnsTotal": 2,
    }
    crc = binascii.crc32(_go_json(payload))
    assert s["file"] == f"schema_42_{crc:010d}.json"  # %010d, generator.go:49
    # body carries the full SchemaFile shape in declaration order
    assert list(s["body"]) == ["Table", "Schema", "Version", "TableVersion",
                               "Query", "Type", "TableColumns",
                               "TableColumnsTotal"]
    assert s["body"]["TableColumns"][0]["ColumnName"] == "val"  # unsorted body


def test_sidecar_checksum_insensitive_to_column_order():
    a = schema_sidecar("s", "t", [{"name": "a", "type": "int"},
                                  {"name": "b", "type": "int"}])
    b = schema_sidecar("s", "t", [{"name": "b", "type": "int"},
                                  {"name": "a", "type": "int"}])
    assert a["file"] == b["file"]
    assert json.dumps(a["body"]) != json.dumps(b["body"])
