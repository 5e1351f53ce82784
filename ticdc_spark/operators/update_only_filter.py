"""F5 — update-only-columns filter.

Reference: `pkg/filter/update_only_columns_filter.go:33-54` (config
`pkg/config/filter.go:46`): drop UPDATE events whose changes are
confined to the listed columns — i.e. every column OUTSIDE the list is
unchanged (before == after, null-safe).

Pure column predicate (null-safe struct field compares), codegen'd.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ticdc_spark.operators.table_filter import table_filter_predicate


def update_only_columns_drop(
    matcher: list[str], ignored_columns: list[str], payload_fields: list[str]
) -> Column:
    others = [f for f in payload_fields if f not in ignored_columns]
    if not others:
        unchanged_outside = F.lit(True)
    else:
        unchanged_outside = functools.reduce(
            operator.and_,
            [
                F.col(f"before.{f}").eqNullSafe(F.col(f"after.{f}"))
                for f in others
            ],
        )
    return (
        table_filter_predicate(matcher)
        & (F.col("op") == "U")
        & unchanged_outside
    )


def apply_update_only_columns_filter(
    cl: DataFrame, matcher: list[str], ignored_columns: list[str]
) -> DataFrame:
    payload_fields = [f.name for f in cl.schema["after"].dataType.fields]
    return cl.filter(
        ~update_only_columns_drop(matcher, ignored_columns, payload_fields)
    )
