"""Portable HyperLogLog distinct sketch (md5-derived, hash-exact).

At 100 TB an exact ``COUNT(DISTINCT col)`` is a full shuffle of every
distinct value; a register sketch is a map-side fold to ``m`` integers
per group that merges associatively across partitions (``max`` per
register) — the same reason the reference keeps per-span watermarks
instead of global scans.  Spark's built-in ``approx_count_distinct``
(HLL++) is not oracle-checkable (engine-private hashing), so this is a
from-scratch HLL whose every intermediate is *bit-for-bit identical* in
Spark and DuckDB:

- hash: first 12 hex chars of ``md5`` → 48-bit integer (same trick as
  ``routing.hash32_md5``); top ``b=8`` bits pick one of ``m=256``
  registers, the remaining 40 bits feed the rank;
- rank ``rho`` = position of the leftmost 1-bit of the 40-bit suffix,
  computed as ``40 - length(bin(w)) + 1`` — pure string/int ops, both
  engines render ``bin()`` minimal-width;
- the harmonic denominator ``sum(2^-M_j)`` is kept *integer-scaled*:
  ``S = sum(1 << (41 - M_j))`` plus ``2^41`` per empty register.  Every
  term is a power of two ≤ 2^41 and the total is ≤ 2^49, so a BIGINT
  sum is exact and order-independent — no float-accumulation skew
  between engines;
- the only floating step is one literal-constant division
  ``ALPHA_NUM / S`` (and ``ln`` for the small-range linear counting),
  rounded before output.

Standard HLL per Flajolet et al. 2007; the small-range correction is
linear counting ``m * ln(m / V)`` for estimates ≤ 2.5m with V > 0
empty registers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_B = 8                      # register-index bits
HLL_M = 1 << HLL_B             # 256 registers
HLL_SUFFIX_BITS = 40           # rank bits (48-bit hash minus index)
HLL_RHO_MAX = HLL_SUFFIX_BITS + 1
_SUFFIX_MASK = (1 << HLL_SUFFIX_BITS) - 1

# alpha_256 * m^2, scaled by the 2^41 integer denominator scale.
# Embedded as one literal so Spark and DuckDB parse the same double.
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
HLL_ALPHA_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RHO_MAX)
HLL_LC_THRESHOLD = 2.5 * HLL_M


def hll_cell(col: Column) -> tuple[Column, Column]:
    """(register, rho) for one value: the map-side emission."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast("long")
    reg = F.shiftright(h, HLL_SUFFIX_BITS)
    w = h.bitwiseAND(F.lit(_SUFFIX_MASK))
    rho = (
        F.when(w == 0, F.lit(HLL_RHO_MAX))
        .otherwise(F.lit(HLL_SUFFIX_BITS) - F.length(F.bin(w)) + 1)
    )
    return reg.alias("reg"), rho.cast("int").alias("rho")


def hll_cell_sql(expr: str) -> str:
    """DuckDB rendering of :func:`hll_cell` over SQL expression ``expr``."""
    h = f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 12))::BIGINT)"
    w = f"({h} & {_SUFFIX_MASK})"
    rho = (
        f"CASE WHEN {w} = 0 THEN {HLL_RHO_MAX} "
        f"ELSE {HLL_SUFFIX_BITS} - length(bin({w})) + 1 END"
    )
    return f"({h} >> {HLL_SUFFIX_BITS}) AS reg, CAST({rho} AS INT) AS rho"


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Registers ``(group..., reg, max_rho)`` → per-group estimate.

    Output: ``v_zero`` (empty registers), ``s_scaled`` (exact BIGINT
    harmonic denominator), ``est`` (corrected estimate, 2 dp).
    """
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_MAX} - max_rho)")).alias("s_present"),
    )
    v_zero = F.lit(HLL_M) - F.col("n_regs")
    s = (F.col("s_present")
         + v_zero.cast("long") * F.lit(1 << HLL_RHO_MAX)).alias("s_scaled")
    raw = F.lit(HLL_ALPHA_NUM) / F.col("s_scaled")
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v_zero"))
    return (
        agg.select(*group_cols, v_zero.cast("long").alias("v_zero"), s)
        .withColumn(
            "est",
            F.round(
                F.when((raw <= HLL_LC_THRESHOLD) & (F.col("v_zero") > 0), lc)
                .otherwise(raw),
                2,
            ),
        )
    )


def hll_estimate_sql(regs_sql: str, group_cols: list[str]) -> str:
    """DuckDB rendering of :func:`hll_estimate` over a registers CTE."""
    g = ", ".join(group_cols)
    scale = 1 << HLL_RHO_MAX
    # force DOUBLE literals — DuckDB types bare decimal literals as
    # DECIMAL, whose division scale could drift from Spark's double math
    def dlit(x: float) -> str:
        s = repr(float(x))
        return s if "e" in s or "E" in s else s + "e0"

    num, thr, m = dlit(HLL_ALPHA_NUM), dlit(HLL_LC_THRESHOLD), dlit(HLL_M)
    return f"""
    SELECT {g}, v_zero, s_scaled,
           round(CASE WHEN {num} / s_scaled <= {thr}
                       AND v_zero > 0
                      THEN {m} * ln({m} / v_zero)
                      ELSE {num} / s_scaled END, 2) AS est
    FROM (
      SELECT {g},
             CAST({HLL_M} - count(*) AS BIGINT) AS v_zero,
             CAST(sum((1::BIGINT) << ({HLL_RHO_MAX} - max_rho))
                  + ({HLL_M} - count(*)) * {scale}::BIGINT AS BIGINT) AS s_scaled
      FROM ({regs_sql}) GROUP BY {g}
    )
    """


# ---------------------------------------------------------------------------
# Count-Min sketch — heavy-hitter detection (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------
# At 100 TB, exact per-key frequencies need a full shuffle on the key;
# the CMS is a map-side-combinable (d × w) counter grid whose update is
# associative addition — the natural feed for hot-key detection ahead of
# skew mitigation (salting / AQE skew join, `maintainer/split/
# write_bytes_splitter.go:30` is the reference's equivalent signal).
# Everything is integer arithmetic on md5-derived indices: no float
# parity risk at all.

CMS_D = 4          # hash rows
CMS_W = 512        # counters per row

_CMS_SALTS = tuple(range(CMS_D))


def cms_cells(col: Column) -> Column:
    """Array of ``d`` (row, idx) cells for one value — explode to feed
    the counter aggregation."""
    cells = [
        F.struct(
            F.lit(j).alias("j"),
            (F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(str(j)),
                                                  col.cast("string"))),
                                1, 8), 16, 10).cast("long")
             % CMS_W).alias("idx"),
        )
        for j in _CMS_SALTS
    ]
    return F.array(*cells)


def cms_cells_sql(expr: str, src: str, carry: str = "") -> str:
    """DuckDB twin: UNION ALL over the d salted hashes; ``carry``
    columns ride along (for point queries keyed by the value)."""
    lead = f"{carry}, " if carry else ""
    parts = []
    for j in _CMS_SALTS:
        h = (f"(('0x' || substr(md5('{j}' || ':' || "
             f"CAST({expr} AS VARCHAR)), 1, 8))::BIGINT % {CMS_W})")
        parts.append(f"SELECT {lead}{j} AS j, {h} AS idx FROM {src}")
    return " UNION ALL ".join(parts)


def cms_counters(df: DataFrame, col: Column) -> DataFrame:
    """(j, idx, c) counter grid — one shuffle on at most d·w keys."""
    return (
        df.select(F.explode(cms_cells(col)).alias("cell"))
        .groupBy(F.col("cell.j").alias("j"), F.col("cell.idx").alias("idx"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(counters: DataFrame, keys: DataFrame,
                 key_col: str) -> DataFrame:
    """Point query: est(k) = min over rows of counter[j][h_j(k)].

    ``keys`` is the candidate set (small — broadcast); the join hits
    d rows per key in the d·w-row grid."""
    cells = keys.select(
        key_col, F.explode(cms_cells(F.col(key_col))).alias("cell")
    ).select(key_col, F.col("cell.j").alias("j"),
             F.col("cell.idx").alias("idx"))
    return (
        # LEFT join: a cell absent from the grid is a zero counter — an
        # inner join would drop it and overestimate keys the sketch
        # never saw (est must be 0 for them, not min of present cells).
        cells.join(counters, ["j", "idx"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_est"))
    )
