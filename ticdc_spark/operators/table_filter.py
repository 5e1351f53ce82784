"""F1 — wildcard table filter.

Reference: `pkg/filter/filter.go:47-236` (``ShouldIgnoreTable:217``),
rule syntax from tidb-tools table-filter: an ordered rule list like
``['*.*', '!test.skip', 'test.tp_*']``. Semantics: rules are evaluated in
order and the LAST matching rule decides (``!`` = exclude); a table that
matches no rule is excluded.

Spark-first: the rule list compiles once into a single boolean ``Column``
expression over (schema_name, table_name) metadata columns — pure JVM
regex inside whole-stage codegen, and because it references only
metadata columns Catalyst pushes it into the parquet scan when those are
partition or data columns. No per-row Python.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _wildcard_to_regex(pat: str) -> str:
    """fnmatch-style ``*``/``?`` → anchored Java regex (case-insensitive
    handled by caller)."""
    out = []
    for ch in pat:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def table_filter_predicate(
    rules: list[str],
    schema_col: str = "schema_name",
    table_col: str = "table_name",
    case_sensitive: bool = True,
) -> Column:
    """Compile filter rules into one boolean Column (last match wins)."""
    acc: Column = F.lit(False)
    sch = F.col(schema_col)
    tbl = F.col(table_col)
    if not case_sensitive:
        sch, tbl = F.lower(sch), F.lower(tbl)
    for rule in rules:
        accept = not rule.startswith("!")
        body = rule.lstrip("!")
        if not case_sensitive:
            body = body.lower()
        if "." in body:
            schema_pat, table_pat = body.split(".", 1)
        else:
            schema_pat, table_pat = body, "*"
        cond = sch.rlike(_wildcard_to_regex(schema_pat)) & tbl.rlike(
            _wildcard_to_regex(table_pat)
        )
        acc = F.when(cond, F.lit(accept)).otherwise(acc)
    return acc


def apply_table_filter(df: DataFrame, rules: list[str], **kw) -> DataFrame:
    return df.filter(table_filter_predicate(rules, **kw))


def oracle_predicate_sql(rules: list[str]) -> str:
    """The same last-match-wins fold as a portable SQL CASE expression
    (DuckDB side). LIKE patterns: ``*``→``%``, ``?``→``_``."""
    expr = "FALSE"
    for rule in rules:
        accept = "TRUE" if not rule.startswith("!") else "FALSE"
        body = rule.lstrip("!")
        schema_pat, table_pat = (body.split(".", 1) + ["*"])[:2] if "." in body else (body, "*")

        def like(p: str) -> str:
            return p.replace("%", r"\%").replace("_", r"\_").replace("*", "%").replace("?", "_")

        cond = (
            f"(schema_name LIKE '{like(schema_pat)}' ESCAPE '\\' "
            f"AND table_name LIKE '{like(table_pat)}' ESCAPE '\\')"
        )
        expr = f"CASE WHEN {cond} THEN {accept} ELSE ({expr}) END"
    return expr
