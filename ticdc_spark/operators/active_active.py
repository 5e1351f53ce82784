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
