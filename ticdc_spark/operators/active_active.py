"""P6 — active-active (BDR) transforms: soft-delete rewriting.

Reference: `pkg/common/event/active_active.go:74-456` +
`pkg/sink/mysql/mysql_writer_dml_active_active.go` — in bidirectional
replication, deletes are written as soft-delete UPDATEs (a deletion-mark
column) to avoid ping-pong, and conflict columns (origin, logical clock)
ride along; conversely an upstream UPDATE that sets the deletion mark is
treated as a DELETE downstream.

Spark-first: two conditional rewrites over the changelog — pure column
algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletes_to_soft_deletes(cl: DataFrame, origin: str = "spark-cdc") -> DataFrame:
    """D → U carrying the before image plus deletion-mark metadata
    (the downstream writer renders the mark column)."""
    return (
        cl.withColumn(
            "soft_delete", (F.col("op") == "D")
        )
        .withColumn("origin", F.lit(origin))
        .withColumn(
            "op", F.when(F.col("op") == "D", F.lit("U")).otherwise(F.col("op"))
        )
        .withColumn(
            "after",
            F.when(F.col("soft_delete"), F.col("before")).otherwise(F.col("after")),
        )
    )


def soft_deletes_to_deletes(cl: DataFrame, mark_col: str = "soft_delete") -> DataFrame:
    """Inverse: updates flagged with the deletion mark become DELETEs."""
    # Materialize the mark BEFORE rewriting op: withColumn chains see the
    # updated op, so testing `op == 'U'` after the rewrite would never
    # match (the after-image would silently survive the delete).
    marked = F.col("_aa_marked")
    return (
        cl.withColumn("_aa_marked", F.col(mark_col) & (F.col("op") == "U"))
        .withColumn(
            "op", F.when(marked, F.lit("D")).otherwise(F.col("op"))
        )
        .withColumn(
            "before",
            F.when(marked, F.coalesce(F.col("before"), F.col("after"))).otherwise(
                F.col("before")
            ),
        )
        .withColumn(
            "after",
            F.when(marked, F.lit(None).cast(cl.schema["after"].dataType)).otherwise(
                F.col("after")
            ),
        )
        .drop("_aa_marked")
    )


# ---------------------------------------------------------------------------
# Active-active TSO-index compatibility check
# (`pkg/check/active_active_tso_indexes.go:52-119`)
# ---------------------------------------------------------------------------
class TSOIndexIncompatible(ValueError):
    """CDC:ErrActiveActiveTSOIndexIncompatible."""


_TSO_UNIQUE_KEY = "tso-unique-index"
_TSO_MAX_KEY = "tso-max-index"
_MYSQL_SCHEMES = ("mysql", "tidb")


def _parse_tso_rows(rows: list[tuple[str, str, str]],
                    side: str) -> tuple[int, int]:
    """SHOW CONFIG rows (instance, name, value) → (unique, max).

    Fail-closed like the reference: a missing key, an unparseable value,
    or two instances disagreeing is an error, never a default."""
    seen: dict[str, dict[str, int]] = {}
    for instance, name, value in rows:
        if name not in (_TSO_UNIQUE_KEY, _TSO_MAX_KEY):
            continue
        try:
            iv = int(value)
        except (TypeError, ValueError):
            raise TSOIndexIncompatible(
                f"{side}: {name}={value!r} is not an integer") from None
        prev = seen.setdefault(name, {})
        for other_inst, other_v in prev.items():
            if other_v != iv:
                raise TSOIndexIncompatible(
                    f"{side}: {name} differs across instances "
                    f"({other_inst}={other_v}, {instance}={iv})")
        prev[instance] = iv
    out = []
    for key in (_TSO_UNIQUE_KEY, _TSO_MAX_KEY):
        if key not in seen:
            raise TSOIndexIncompatible(f"{side}: missing {key}")
        out.append(next(iter(seen[key].values())))
    return out[0], out[1]


def validate_active_active_tso_indexes(
    cfg,
    upstream_rows: list[tuple[str, str, str]],
    downstream_rows: list[tuple[str, str, str]],
) -> None:
    """Active-active changefeeds writing to a MySQL-compatible sink must
    run on clusters with DISTINCT ``tso-unique-index`` (else the two
    sides mint colliding TSOs) and IDENTICAL ``tso-max-index`` (else
    the logical index ranges differ).  Skipped when active-active is
    off or the sink is not MySQL-compatible; everything else is
    fail-closed (`active_active_tso_indexes.go:49-119`)."""
    if not getattr(cfg, "bdr_mode", False):
        return
    scheme = str(getattr(cfg, "sink_uri", "")).split("://", 1)[0]
    if scheme not in _MYSQL_SCHEMES:
        return
    up_u, up_m = _parse_tso_rows(upstream_rows, "upstream")
    down_u, down_m = _parse_tso_rows(downstream_rows, "downstream")
    if up_u == down_u:
        raise TSOIndexIncompatible(
            f"upstream and downstream share the same "
            f"tso-unique-index={up_u}, upstream max={up_m}, "
            f"downstream max={down_m}")
    if up_m != down_m:
        raise TSOIndexIncompatible(
            f"upstream unique={up_u}, upstream max={up_m}, "
            f"downstream unique={down_u}, downstream max={down_m}")
