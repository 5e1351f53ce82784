"""P3/P4 — MQ-protocol image projections.

P3 ``only-output-updated-columns`` (`pkg/config/sink.go:163-164`, applied
in the open/canal encoders via `pkg/sink/codec/common/config.go:87`):
for UPDATE events, columns whose before==after are nulled in the old
image so the message carries only what changed.

P4 ``delete-only-output-handle-key`` (`pkg/config/sink.go:166-167`):
DELETE events keep only primary-key columns in the image.

Both are pure struct rewrites — ``when/otherwise`` column algebra, zero
shuffle, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def only_updated_columns(cl: DataFrame, image: str = "before") -> DataFrame:
    """Null-out unchanged fields of ``image`` on update rows (P3)."""
    payload_type = cl.schema["after"].dataType
    fields = []
    for f in payload_type.fields:
        unchanged = (
            F.col(f"before.{f.name}").eqNullSafe(F.col(f"after.{f.name}"))
        )
        fields.append(
            F.when(unchanged, F.lit(None).cast(f.dataType))
            .otherwise(F.col(f"{image}.{f.name}"))
            .alias(f.name)
        )
    rewritten = F.struct(*fields)
    return cl.withColumn(
        image,
        F.when(
            (F.col("op") == "U") & F.col(image).isNotNull(), rewritten
        ).otherwise(F.col(image)),
    )


def delete_handle_key_only(cl: DataFrame, pk_fields: tuple[str, ...] = ("id",)) -> DataFrame:
    """Strip delete images to handle-key columns only (P4)."""
    payload_type = cl.schema["before"].dataType
    fields = [
        (
            F.col(f"before.{f.name}")
            if f.name in pk_fields
            else F.lit(None).cast(f.dataType)
        ).alias(f.name)
        for f in payload_type.fields
    ]
    return cl.withColumn(
        "before",
        F.when(
            (F.col("op") == "D") & F.col("before").isNotNull(), F.struct(*fields)
        ).otherwise(F.col("before")),
    )
