"""P1 — column selector.

Reference: `downstreamadapter/sink/columnselector/column_selector.go:29-162`
— per-table include lists applied to the row images before encoding, with
a plan-time verification that a usable unique index survives
(``verifyIndices:162``).

Spark-first: rebuild the before/after structs keeping only selected
fields. Because this engine carries a unified changelog schema across
tables, a dropped field is represented as NULL in the image struct (the
encoders skip NULL-field emission, giving the same wire effect as the
reference's physical column drop). Catalyst constant-folds the NULL
branches and prunes fields that no rule keeps out of the parquet scan.
First matching rule wins per table, mirroring the reference's rule walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ticdc_spark.operators.table_filter import table_filter_predicate


def select_columns_physical(
    cl: DataFrame,
    columns: list[str],
    pk_fields: tuple[str, ...] = ("id",),
) -> DataFrame:
    """Physical column drop for a single-table (typed-payload) changelog:
    the before/after structs are rebuilt with ONLY the selected fields, so
    the output schema no longer contains dropped columns at all — exactly
    the reference's behavior (`column_selector.go:29-162`), and the form
    that lets Catalyst prune dropped columns out of the parquet scan
    (``ReadSchema`` shrinks, not just NULLs).

    Use this when the frame carries one table (per-table typed payloads);
    ``select_columns`` remains for multi-table unified frames where rules
    differ per table and the schema must stay the union.
    """
    missing = [k for k in pk_fields if k not in columns]
    if missing:
        raise ValueError(
            f"column selector drops handle-key column(s) {missing}; "
            "a usable unique index must survive (columnselector.go:162)"
        )
    payload_fields = [f.name for f in cl.schema["after"].dataType.fields]
    unknown = [c for c in columns if c not in payload_fields]
    if unknown:
        raise ValueError(f"column selector references unknown column(s) {unknown}")
    kept = [f for f in payload_fields if f in columns]  # keep schema order
    out = cl
    for image in ("before", "after"):
        out = out.withColumn(
            image,
            F.when(
                F.col(image).isNotNull(),
                F.struct(*[F.col(f"{image}.{f}").alias(f) for f in kept]),
            ),
        )
    return out


def select_columns(
    cl: DataFrame,
    rules: list[dict],
    pk_fields: tuple[str, ...] = ("id",),
) -> DataFrame:
    """rules: [{"matcher": ["test.tp_*"], "columns": ["id", "val"]}] — same
    field names as the reference's ``sink.column-selectors`` config
    (`pkg/config/sink.go`)."""
    payload_type = cl.schema["after"].dataType
    payload_fields = [f.name for f in payload_type.fields]

    for rule in rules:
        missing = [k for k in pk_fields if k not in rule["columns"]]
        if missing:
            raise ValueError(
                f"column selector drops handle-key column(s) {missing}; "
                "a usable unique index must survive (columnselector.go:162)"
            )

    out = cl
    for image in ("before", "after"):
        fields = []
        for f in payload_fields:
            ftype = payload_type[f].dataType
            expr = F.col(f"{image}.{f}")  # no rule matches → keep as-is
            for rule in reversed(rules):  # first matching rule wins
                cond = table_filter_predicate(rule.get("matcher", ["*.*"]))
                kept = F.col(f"{image}.{f}") if f in rule["columns"] else F.lit(None).cast(ftype)
                expr = F.when(cond, kept).otherwise(expr)
            fields.append(expr.alias(f))
        out = out.withColumn(
            image,
            F.when(F.col(image).isNotNull(), F.struct(*fields)),
        )
    return out
