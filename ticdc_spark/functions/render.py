"""Scalar rendering helpers shared by the wire encoders (SURVEY §2.9).

The reference hand-renders MySQL values per protocol
(`pkg/sink/codec/csv/csv_message.go:276-323`,
`pkg/sink/codec/common/java.go:70-146`). Here every codec goes through
one canonical rendering so encoder outputs are deterministic and
portable across engines (the DuckDB oracle re-renders with the same
rules):

- integers/strings: plain cast
- float/double: fixed ``%.2f`` (payload values carry 2 decimals; the
  shortest-round-trip repr of raw casts differs across engines)
- NULL: protocol-specific (JSON ``null``, csv ``\\N``)

All helpers return Column expressions — JVM-side, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, DoubleType, FloatType, TimestampType

FLOAT_FMT = "%.2f"


def render_scalar(col: Column, dtype) -> Column:
    if isinstance(dtype, (DoubleType, FloatType)):
        return F.when(col.isNotNull(), F.format_string(FLOAT_FMT, col))
    if isinstance(dtype, DateType):
        # canonical MySQL DATE text (csv_message.go:276-323 renders
        # temporals as their MySQL string forms)
        return F.date_format(col, "yyyy-MM-dd")
    if isinstance(dtype, TimestampType):
        # canonical DATETIME/TIMESTAMP text at fsp=0 (mounter is
        # timezone-aware; the session is pinned to UTC on both engines)
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def json_escape(col: Column) -> Column:
    """Minimal JSON string escaping (backslash, quote) — payloads here
    contain no control characters."""
    return F.replace(
        F.replace(col, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
    )


def json_string_or_null(col: Column, dtype) -> Column:
    rendered = render_scalar(col, dtype)
    return F.when(
        rendered.isNotNull(), F.concat(F.lit('"'), json_escape(rendered), F.lit('"'))
    ).otherwise(F.lit("null"))


def json_number(col: Column) -> Column:
    return F.when(col.isNotNull(), col.cast("string")).otherwise(F.lit("null"))
