"""F3 — SQL expression filter ("the flagship free-in-Spark win").

Reference: `pkg/filter/expr_filter.go:40-56` (eval at :361) embeds the
whole TiDB expression engine to evaluate ``ignore-insert-value-expr`` /
``ignore-update-new-value-expr`` / ``ignore-update-old-value-expr`` /
``ignore-delete-value-expr`` (`pkg/config/filter.go:42-45`) against row
images.

In Spark the user's SQL predicate string compiles via ``F.expr`` straight
into Catalyst — constant folding, codegen, and pushdown included. The
expression is evaluated against the ``after`` struct for insert/update-new,
``before`` for delete/update-old, by rewriting bare column references to
struct field access.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ticdc_spark.operators.table_filter import table_filter_predicate


def _against(expr_sql: str, image: str, fields: list[str]) -> str:
    """Qualify bare payload column refs with the before/after struct."""
    out = expr_sql
    for f in sorted(fields, key=len, reverse=True):
        out = __import__("re").sub(rf"(?<![\w.`]){f}(?![\w(])", f"{image}.{f}", out)
    return out


def expr_filter_drop_predicate(
    matcher: list[str],
    payload_fields: list[str],
    ignore_insert_value_expr: str | None = None,
    ignore_update_new_value_expr: str | None = None,
    ignore_update_old_value_expr: str | None = None,
    ignore_delete_value_expr: str | None = None,
) -> Column:
    scoped = table_filter_predicate(matcher)
    drop: Column = F.lit(False)
    if ignore_insert_value_expr:
        drop = drop | (
            (F.col("op") == "I")
            & F.expr(_against(ignore_insert_value_expr, "after", payload_fields))
        )
    if ignore_update_new_value_expr:
        drop = drop | (
            (F.col("op") == "U")
            & F.expr(_against(ignore_update_new_value_expr, "after", payload_fields))
        )
    if ignore_update_old_value_expr:
        drop = drop | (
            (F.col("op") == "U")
            & F.expr(_against(ignore_update_old_value_expr, "before", payload_fields))
        )
    if ignore_delete_value_expr:
        drop = drop | (
            (F.col("op") == "D")
            & F.expr(_against(ignore_delete_value_expr, "before", payload_fields))
        )
    return scoped & drop


def apply_expr_filter(df: DataFrame, matcher: list[str], payload_fields: list[str], **exprs) -> DataFrame:
    return df.filter(~expr_filter_drop_predicate(matcher, payload_fields, **exprs))
