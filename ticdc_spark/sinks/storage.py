"""K4 — cloud-storage sink: path layout + schema sidecars (SURVEY §2.11).

Reference: data files at
``<schema>/<table>/<tableVersion>/[partition]/[date]/CDC_<dispatcher>_<index>.<ext>``
(`pkg/cloudstorage/generator.go:126-128,186`), index ≥ 6 digits
(``CDC000001.csv``, `generator.go:43`), date-separator none/year/month/day
(`pkg/config/sink.go:154-155`), schema sidecars
``schema_{version}_{checksum}.json`` (`generator.go:51-102`).

Spark-first: the path is a derived column; the physical write is
``partitionBy`` on it (or foreachBatch for exact file naming). File
*index* assignment is a per-(table,date) row_number over flush order —
a window, only used at actual write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def storage_paths(
    cl: DataFrame,
    table_version: int = 1,
    date_separator: str = "day",
    extension: str = "csv",
    rows_per_file: int = 4096,
    file_index_width: int = 20,
    enable_partition_separator: bool = True,
) -> DataFrame:
    """Append ``path`` (directory) and ``file_name`` columns.

    ``enable_partition_separator`` ([sink] enable-partition-separator,
    `pkg/config/sink.go:157`, default true per `replica_config.go:77`):
    when on AND the row's table is a physical partition (frame carries
    ``is_partition`` + ``table_id``), the physical table id becomes a
    path segment between table version and date —
    ``<schema>/<table>/<version>[/partition][/date]``
    (`pkg/cloudstorage/generator.go:435-437`,
    `path_key.go:198-217` generateDMLDataDirPath)."""
    if date_separator == "day":
        date_fmt = "yyyy-MM-dd"
    elif date_separator == "month":
        date_fmt = "yyyy-MM"
    elif date_separator == "year":
        date_fmt = "yyyy"
    else:
        date_fmt = None
    parts = [
        F.col("schema_name"), F.lit("/"), F.col("table_name"),
        F.lit(f"/{table_version}"),
    ]
    if enable_partition_separator and "is_partition" in cl.columns:
        parts.append(
            F.when(F.col("is_partition"),
                   F.concat(F.lit("/"), F.col("table_id").cast("string")))
            .otherwise(F.lit("")))
    if date_fmt:
        parts += [
            F.lit("/"),
            F.date_format(F.timestamp_micros(F.col("commit_ts")), date_fmt),
        ]
    path = F.concat(*parts)
    # File index: flush order within (path) in rows_per_file chunks.
    from pyspark.sql import Window

    w = Window.partitionBy(path).orderBy("commit_ts", "seq")
    idx = ((F.row_number().over(w) - 1) / rows_per_file).cast("long") + 1
    # file-index-width config (`pkg/config/sink.go:68-73`):
    # DefaultFileIndexWidth=20, clamped to [Min=6, Max=20] — default
    # file names are CDC00000000000000000001.csv, reference layout
    width = min(max(int(file_index_width), 6), 20)
    file_name = F.concat(
        F.lit("CDC"), F.lpad(idx.cast("string"), width, "0"),
        F.lit(f".{extension}"),
    )
    return cl.withColumn("path", path).withColumn("file_name", file_name)


def _table_col(c: dict) -> dict:
    """TableCol in Go struct-field order with omitempty semantics
    (`pkg/cloudstorage/schema_file.go:40-50`)."""
    out: dict = {}
    if c.get("id"):
        out["ColumnId"] = str(c["id"])
    out["ColumnName"] = c["name"]
    out["ColumnType"] = str(c["type"]).upper()
    if c.get("default") is not None:
        out["ColumnDefault"] = c["default"]
    if c.get("precision"):
        out["ColumnPrecision"] = str(c["precision"])
    if c.get("scale"):
        out["ColumnScale"] = str(c["scale"])
    if c.get("nullable"):
        out["ColumnNullable"] = "true"
    if c.get("is_pk"):
        out["ColumnIsPk"] = "true"
    return out


def _go_json(obj) -> bytes:
    """Go ``json.MarshalIndent(v, "", "    ")`` byte layout (Python's
    ``indent=4`` with ``(",", ": ")`` separators is identical for
    content free of Go's HTML-escaped chars ``& < >``)."""
    import json

    return json.dumps(obj, indent=4, separators=(",", ": ")).encode()


def schema_sidecar(schema_name: str, table_name: str,
                   payload_fields: list, table_version: int = 1,
                   query: str = "", ddl_type: int = 0) -> dict:
    """``schema_{version}_{checksum}.json`` — byte-faithful to the
    reference: body is the SchemaFile JSON (schema_file.go:170-182,
    MarshalIndent with 4-space indent), the filename checksum is
    PositionInertia (= crc32-IEEE of one write) over the
    ``checksumPayload`` marshal — Table, Schema, Version=0, columns
    sorted by ColumnName, TotalColumns (schema_file.go:263-294) —
    rendered ``%010d`` (generator.go:49).

    ``payload_fields``: dicts (name/type[/id/default/precision/scale/
    nullable/is_pk]) or legacy (name, type) tuples.
    """
    import binascii

    cols = [
        _table_col(c if isinstance(c, dict) else {"name": c[0], "type": c[1]})
        for c in payload_fields
    ]
    body = {
        "Table": table_name,
        "Schema": schema_name,
        "Version": 0,
        "TableVersion": table_version,
        "Query": query,
        "Type": ddl_type,
        "TableColumns": cols,
        "TableColumnsTotal": len(cols),
    }
    checksum_payload = {
        "Table": table_name,
        "Schema": schema_name,
        "Version": 0,
        "TableColumns": sorted(cols, key=lambda c: c["ColumnName"]),
        "TableColumnsTotal": len(cols),
    }
    checksum = binascii.crc32(_go_json(checksum_payload))
    return {
        "file": f"schema_{table_version}_{checksum:010d}.json",
        "body": body,
    }


def expired_files(
    files: DataFrame,
    checkpoint_ts_us: int,
    file_expiration_days: int,
    date_separator: str = "day",
) -> DataFrame:
    """K4 housekeeping — `pkg/cloudstorage/generator.go:514-541`
    ``RemoveExpiredFiles``: with day-separated layouts, a file whose
    path date is strictly before ``checkpoint - TTL`` (formatted as a
    date) is expired and removed; other separators are exempt (the
    reference returns early).

    Input: (path, file_name) frames from :func:`storage_paths`.
    Output adds ``expired``; the caller deletes flagged paths.  Pure
    column algebra — the date comparison is lexical on the formatted
    ``yyyy-MM-dd`` component exactly like the reference's regex-match
    string compare.
    """
    if date_separator != "day":
        return files.withColumn("expired", F.lit(False))
    expire_edge = F.date_format(
        F.timestamp_micros(
            F.lit(checkpoint_ts_us)
            - F.lit(int(file_expiration_days) * 86_400_000_000)
        ),
        "yyyy-MM-dd",
    )
    date_part = F.regexp_extract(
        F.col("path"), r"/(\d{4}-\d{2}-\d{2})$", 1)
    return files.withColumn(
        "expired",
        (date_part != "") & (date_part < expire_edge),
    )
