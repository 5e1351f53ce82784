"""P5 — integrity row checksum.

Reference: `pkg/integrity/integrity.go:24-43` + `pkg/integrity/checksum.go`
(levels none/correctness), verified at mount (`mounter.go:100-112`): a
checksum over the row image detects corruption between capture and sink.

Spark-first: a deterministic digest column over the canonicalized image
(md5 of a field-separated rendering — md5 is available in both Spark and
the DuckDB oracle; the reference uses crc32, which DuckDB lacks, so the
digest function is pluggable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_TOKEN = "\\N"  # csv-style null sentinel (pkg/config/sink.go:278-279)


def render_field(col: Column, dtype) -> Column:
    """Canonical text rendering: floats get fixed '%.6f' (portable across
    engines — raw double→string shortest-repr rules differ), everything
    else is a plain cast."""
    from pyspark.sql.types import DoubleType, FloatType

    if isinstance(dtype, (DoubleType, FloatType)):
        return F.when(col.isNotNull(), F.format_string("%.6f", col))
    return col.cast("string")


def image_digest(image: str, schema) -> Column:
    rendered = [
        F.coalesce(render_field(F.col(f"{image}.{f.name}"), f.dataType), F.lit(NULL_TOKEN))
        for f in schema.fields
    ]
    return F.md5(F.concat_ws("|", *rendered))


def verify_checksums(cl: DataFrame, checksum_col: str = "checksum") -> DataFrame:
    """The mounter-side verification (`mounter.go:100-112`): recompute the
    digest from the images and flag rows whose carried checksum differs
    (corruption between capture and sink). Returns the frame with a
    ``checksum_ok`` column; callers route failures to a dead-letter sink
    or raise, per integrity level (none/correctness)."""
    schema = cl.schema["after"].dataType
    recomputed = F.when(
        F.col("after").isNotNull(), image_digest("after", schema)
    ).otherwise(image_digest("before", schema))
    return cl.withColumn("checksum_ok", F.col(checksum_col) == recomputed)


def with_row_checksum(cl: DataFrame) -> DataFrame:
    schema = cl.schema["after"].dataType
    return cl.withColumn(
        "checksum",
        F.when(F.col("after").isNotNull(), image_digest("after", schema)).otherwise(
            image_digest("before", schema)
        ),
    )
