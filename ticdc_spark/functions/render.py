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
from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    FloatType,
    TimestampType,
)

FLOAT_FMT = "%.2f"


def render_scalar(col: Column, dtype) -> Column:
    if isinstance(dtype, (DoubleType, FloatType)):
        return F.when(col.isNotNull(), F.format_string(FLOAT_FMT, col))
    if isinstance(dtype, ArrayType) and isinstance(
        dtype.elementType, (FloatType, DoubleType)
    ):
        # TiDB VECTOR canonical text ``[v1,v2,...]`` (csv_message.go:
        # 276-323 renders vector datums via their String() form); fixed
        # element format keeps the text portable across engines.
        return F.when(
            col.isNotNull(),
            F.concat(
                F.lit("["),
                F.array_join(
                    F.transform(
                        col, lambda x: F.format_string(FLOAT_FMT, x.cast("double"))
                    ),
                    ",",
                ),
                F.lit("]"),
            ),
        )
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


def mount_enum(ordinal: Column, names: tuple[str, ...]) -> Column:
    """ENUM decode at the mounter (SURVEY §2.9): MySQL stores the
    1-based ordinal; downstream wire formats carry the member NAME
    (`csv_message.go:301-307`). Ordinal 0 is MySQL's invalid-empty
    member and renders ``''``; NULL stays NULL. ``F.get`` is 0-based
    and NULL-safe on out-of-range (no ANSI error)."""
    arr = F.array(*[F.lit(n) for n in names])
    return F.when(ordinal == 0, F.lit("")).otherwise(
        F.get(arr, (ordinal - 1).cast("int"))
    )


def mount_set(mask: Column, names: tuple[str, ...]) -> Column:
    """SET decode at the mounter: MySQL stores a uint64 bitmask; the
    wire form is the comma-joined member names in definition order
    (`csv_message.go:308-314`). Empty set renders ``''``; NULL stays
    NULL (``concat_ws`` skips the per-bit NULLs on both engines)."""
    members = [
        F.when(mask.bitwiseAND(F.lit(1 << i)) != 0, F.lit(n))
        for i, n in enumerate(names)
    ]
    return F.when(mask.isNotNull(), F.concat_ws(",", *members))
