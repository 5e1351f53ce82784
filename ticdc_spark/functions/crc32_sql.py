"""CRC32 (IEEE) for DuckDB oracles, and the PositionInertia hash.

The reference's MQ partitioners hash with ``PositionInertia``
(`pkg/hash/position_inertia.go:20-35`): each ``Write(parts...)`` resets
a crc32-IEEE hasher, feeds the concatenated parts, and XORs the sum
into the running value (initial 0).  Spark has JVM-codegen ``crc32``;
DuckDB 1.0 has none, so the oracle computes it with a recursive CTE
over the classic 256-entry table (inputs here are ASCII, so
``ascii(substr(...))`` is the byte value).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _crc_table() -> list[int]:
    out = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        out.append(c)
    return out


def crc32_ieee(col: Column) -> Column:
    """JVM-side crc32 of a string column's bytes (long)."""
    return F.crc32(col.cast("binary"))


def position_inertia(*writes: Column) -> Column:
    """XOR-fold of crc32 over each write's concatenated bytes
    (position_inertia.go: hashValue ^= crc32(parts...))."""
    h: Column = F.lit(0).cast("long")
    for w in writes:
        h = h.bitwiseXOR(crc32_ieee(w))
    return h


def crc32_table_cte() -> str:
    vals = ", ".join(f"({i}, {v})" for i, v in enumerate(_crc_table()))
    return f"__crc_t(i, v) AS (VALUES {vals})"


def crc32_fold_cte(inputs_cte: str) -> str:
    """Recursive fold: ``{inputs_cte}`` must define ``__crc_in(s)``
    (distinct ASCII strings); yields ``__crc_out(s, crc)``."""
    return f"""
{inputs_cte},
__crc_steps(s, pos, c) AS (
  SELECT s, 0, 4294967295::BIGINT FROM __crc_in
  UNION ALL
  SELECT __crc_steps.s, pos + 1, xor(c >> 8, __crc_t.v)
  FROM __crc_steps JOIN __crc_t
    ON __crc_t.i = xor(c, ascii(substr(__crc_steps.s, pos + 1, 1))) & 255
  WHERE pos < length(__crc_steps.s)),
__crc_out AS (
  SELECT s, xor(c, 4294967295) AS crc
  FROM __crc_steps WHERE pos = length(s))
"""
