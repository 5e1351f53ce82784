"""DDL query normalization — CREATE VIEW stored-select substitution
(SURVEY §2.9).

Reference: `pkg/common/event/ddl_query_normalizer.go:47-220`
(``NormalizeCreateViewQueryWithStoredSelect``). TiDB persists the
normalized SELECT body of a view (``TableInfo.View.SelectStmt``) which may
carry resolved source-schema references the original ``job.Query`` text
lacks. The normalizer:

1. parses the stored SELECT's FROM/JOIN table refs into a scope — alias
   names, unambiguous table→schema map, ambiguous names dropped
   (`:147-191`);
2. schema-qualifies unaliased table-qualified column refs:
   ```orders`.`id``` with ``FROM `source_db`.`orders` `` becomes
   ```source_db`.`orders`.`id``` (`:127-146`);
3. uses the stored SELECT as the view body when it references a schema
   other than the current one, or when step 2 changed anything
   (`:92-110`), otherwise keeps the original query.

The reference drives this through the TiDB SQL parser. A full MySQL
parser is out of scope here; this is a backquoted-identifier regex
parser that handles the restore-format SQL TiDB actually stores (every
identifier backquoted — the only form this operator ever receives).
DDL streams are metadata-sized, so the operator runs as an Arrow-batched
pandas UDF over the DDL frame.
"""

from __future__ import annotations

import re

_CREATE_VIEW_RE = re.compile(r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s", re.I)
_BODY_SPLIT_RE = re.compile(r"\sAS\s+(?=SELECT\b)", re.I)
# (`schema`.)?`table` ( [AS] `alias` )?  after FROM or JOIN
_TABLE_REF_RE = re.compile(
    r"(?:FROM|JOIN)\s+(?:`(?P<schema>[^`]+)`\.)?`(?P<table>[^`]+)`"
    r"(?:\s+(?:AS\s+)?`(?P<alias>[^`]+)`)?",
    re.I,
)


def _stored_select_scope(stored: str) -> tuple[set[str], dict[str, str], list[str]]:
    """(aliases, unambiguous table→schema, all schema quals in ref order)
    — mirrors collectCreateViewSelectTables + extractTableSchemas."""
    aliases: set[str] = set()
    by_name: dict[str, str] = {}
    ambiguous: set[str] = set()
    schemas: list[str] = []
    for m in _TABLE_REF_RE.finditer(stored):
        schema = m.group("schema") or ""
        table = m.group("table").lower()
        schemas.append(schema)
        if m.group("alias"):
            aliases.add(m.group("alias").lower())
            continue
        if not schema:
            continue
        if table in ambiguous:
            continue
        if table in by_name:
            del by_name[table]
            ambiguous.add(table)
            continue
        by_name[table] = schema
    return aliases, by_name, schemas


def normalize_create_view_query(
    query: str, stored_select: str, current_schema: str
) -> str:
    """Pure-Python port of NormalizeCreateViewQueryWithStoredSelect
    (`ddl_query_normalizer.go:47-76`)."""
    if not query or not stored_select:
        return query
    if not _CREATE_VIEW_RE.match(query):
        return query

    aliases, by_name, schemas = _stored_select_scope(stored_select)

    # qualifyColumnName (:127-146): `tbl`.`col` → `sch`.`tbl`.`col` for
    # unaliased, unambiguous tables; refs already schema-qualified (the
    # `tbl` token is preceded by '.') are left alone.
    changed = False
    transformed = stored_select
    for table, schema in by_name.items():
        if table in aliases:
            continue
        pat = re.compile(r"(?<!\.)`" + re.escape(table) + r"`\.`", re.I)
        new = pat.sub(f"`{schema}`.`{table}`.`", transformed)
        # the FROM/JOIN ref itself is `sch`.`tbl` — its tbl token is
        # dot-preceded, so only column refs matched.
        if new != transformed:
            changed = True
            transformed = new

    current_only = all(
        s == "" or s.lower() == current_schema.lower() for s in schemas
    )
    if current_only and not changed:
        return query

    parts = _BODY_SPLIT_RE.split(query, maxsplit=1)
    if len(parts) != 2:
        return query
    return parts[0] + " AS " + transformed


def normalize_create_view(ddl, query_col: str = "query",
                          stored_col: str = "stored_select",
                          schema_col: str = "schema_name"):
    """Column wrapper: Arrow-batched pandas UDF over the (tiny) DDL
    stream; emits ``normalized_query``."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    def _norm_impl(q, s, cur):
        return pd.Series([
            normalize_create_view_query(a, b, c)
            for a, b, c in zip(q, s, cur)
        ])

    _norm = F.pandas_udf(_norm_impl, StringType())

    return ddl.withColumn(
        "normalized_query",
        _norm(F.col(query_col), F.col(stored_col), F.col(schema_col)),
    )
