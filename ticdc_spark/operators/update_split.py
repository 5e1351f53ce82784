"""P2 — update split on handle-key change.

Reference: `pkg/common/kv_entry.go:107-131` (``SplitUpdate``): an UPDATE
whose primary/handle key changed cannot be applied as an UPDATE downstream;
it becomes DELETE(before) + INSERT(after). Intra-txn ordering is preserved
by ``dml_order`` (delete=1 < insert=3, `logservice/eventstore/format.go:17-25`).

Spark-first: a single ``explode`` over a conditionally-built array — one
narrow map stage, no shuffle, stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_updates(cl: DataFrame, key_fields: tuple[str, ...] = ("id",)) -> DataFrame:
    """cl: canonical changelog with before/after structs (changelog.py).

    ``key_fields``: the handle-key columns inside the image structs — a
    composite key splits when ANY component changed (the reference
    compares the whole handle value, `kv_entry.go:107-131`)."""
    import functools
    import operator as _op

    key_changed = functools.reduce(
        _op.or_,
        [F.col(f"before.{f}") != F.col(f"after.{f}") for f in key_fields],
    )
    needs_split = (
        (F.col("op") == "U")
        & F.col("before").isNotNull()
        & F.col("after").isNotNull()
        & key_changed
    )

    def piece(op: str, dml_order: int, before, after):
        return F.struct(
            F.lit(op).alias("op"),
            F.lit(dml_order).alias("dml_order"),
            before.alias("before"),
            after.alias("after"),
        )

    null_img = F.lit(None).cast(cl.schema["before"].dataType)
    pieces = F.when(
        needs_split,
        F.array(
            piece("D", 1, F.col("before"), null_img),
            piece("I", 3, null_img, F.col("after")),
        ),
    ).otherwise(
        F.array(piece_orig := F.struct(
            F.col("op").alias("op"),
            F.col("dml_order").alias("dml_order"),
            F.col("before").alias("before"),
            F.col("after").alias("after"),
        ))
    )

    exploded = cl.withColumn("_piece", F.explode(pieces))
    return exploded.select(
        "schema_name", "table_name", "table_id",
        F.col("_piece.op").alias("op"),
        "commit_ts", "start_ts", "seq",
        F.col("_piece.dml_order").alias("dml_order"),
        "pk",
        F.col("_piece.before").alias("before"),
        F.col("_piece.after").alias("after"),
    )
