"""CREATE VIEW stored-select normalization vs the reference's documented
behavior (`pkg/common/event/ddl_query_normalizer.go:29-47` examples,
scope rules `:147-191`)."""

from __future__ import annotations

from ticdc_spark.operators.ddl_normalizer import normalize_create_view_query


def test_docstring_example_1():
    # stored SELECT resolves the source schema → substituted wholesale
    q = "CREATE VIEW `target_db`.`v` AS SELECT `id` FROM `users`"
    stored = "SELECT `id` FROM `source_db`.`users`"
    assert normalize_create_view_query(q, stored, "target_db") == (
        "CREATE VIEW `target_db`.`v` AS SELECT `id` FROM `source_db`.`users`"
    )


def test_docstring_example_2_column_qualification():
    q = "CREATE VIEW `other_db`.`v` AS SELECT `orders`.`id` FROM `orders`"
    stored = "SELECT `orders`.`id` AS `id` FROM `source_db`.`orders`"
    assert normalize_create_view_query(q, stored, "other_db") == (
        "CREATE VIEW `other_db`.`v` AS "
        "SELECT `source_db`.`orders`.`id` AS `id` FROM `source_db`.`orders`"
    )


def test_current_schema_only_unchanged():
    # stored references only the current schema and nothing to qualify →
    # original text kept (createViewSelectUsesCurrentSchemaOnly)
    q = "CREATE VIEW `db`.`v` AS SELECT `id` FROM `t`"
    stored = "SELECT `id` FROM `db`.`t`"
    assert normalize_create_view_query(q, stored, "db") == q
    # case-insensitive schema compare
    assert normalize_create_view_query(q, stored, "DB") == q


def test_alias_refs_not_qualified():
    # explicit alias references are preserved (qualifyColumnName :134-136)
    q = "CREATE VIEW `db`.`v` AS SELECT `a`.`id` FROM `x`.`t` AS `a`"
    stored = "SELECT `a`.`id` FROM `x`.`t` AS `a`"
    out = normalize_create_view_query(q, stored, "db")
    # other-schema ref → stored body used, but `a`.`id` stays unqualified
    assert out == "CREATE VIEW `db`.`v` AS SELECT `a`.`id` FROM `x`.`t` AS `a`"


def test_ambiguous_table_not_qualified():
    # same table name from two schemas → dropped from the map (:181-186)
    stored = ("SELECT `t`.`id` FROM `s1`.`t` JOIN `s2`.`t` "
              "ON `t`.`id` = `t`.`k`")
    q = "CREATE VIEW `db`.`v` AS SELECT 1"
    out = normalize_create_view_query(q, stored, "db")
    assert "`s1`.`t`.`id`" not in out and "`s2`.`t`.`id`" not in out
    # but the stored body IS used (other-schema refs present)
    assert out.endswith(stored)


def test_non_view_and_empty_passthrough():
    assert normalize_create_view_query("", "SELECT 1", "db") == ""
    assert normalize_create_view_query("DROP TABLE `t`", "SELECT 1", "db") \
        == "DROP TABLE `t`"
    q = "CREATE VIEW `db`.`v` AS SELECT `id` FROM `t`"
    assert normalize_create_view_query(q, "", "db") == q
