"""MySQL-sink DDL transforms (sinks/mysql_ddl.py): token-level edge
cases beyond the oracle case tables."""

from __future__ import annotations

from ticdc_spark.sinks.mysql_ddl import (
    format_ddl_query,
    restore_anonymous_index_names,
)


def test_vector_rewrite_preserves_following_columns():
    q = ("CREATE TABLE t (a INT, v VECTOR(3) NOT NULL COMMENT 'x', "
         "b VARCHAR(4) DEFAULT 'y')")
    assert format_ddl_query(q) == (
        "CREATE TABLE t (a INT, v LONGBLOB, b VARCHAR(4) DEFAULT 'y')")


def test_vector_rewrite_quoted_column_name():
    q = "ALTER TABLE t ADD COLUMN `my col` VECTOR(16)"
    assert format_ddl_query(q) == "ALTER TABLE t ADD COLUMN `my col` LONGBLOB"


def test_vector_in_comment_token_untouched():
    q = "CREATE TABLE t (a INT) /* VECTOR(3) */"
    assert format_ddl_query(q) == q


def test_vector_option_with_parenthesized_default():
    q = "CREATE TABLE t (v VECTOR(3) COMMENT 'a(b)c', w INT)"
    assert format_ddl_query(q) == "CREATE TABLE t (v LONGBLOB, w INT)"


def test_index_restore_backtick_escaping():
    out = restore_anonymous_index_names(
        "ALTER TABLE t ADD INDEX (a)", {5: "weird`name"}, [5])
    assert out == "ALTER TABLE t ADD INDEX `weird``name` (a)"


def test_index_restore_unique_index_two_words():
    out = restore_anonymous_index_names(
        "ALTER TABLE t ADD UNIQUE INDEX (a)", {5: "u1"}, [5])
    assert out == "ALTER TABLE t ADD UNIQUE INDEX `u1` (a)"


def test_index_restore_bare_unique():
    out = restore_anonymous_index_names(
        "ALTER TABLE t ADD UNIQUE (a)", {5: "u1"}, [5])
    assert out == "ALTER TABLE t ADD UNIQUE `u1` (a)"


def test_index_restore_no_inputs_is_identity():
    q = "ALTER TABLE t ADD INDEX (a)"
    assert restore_anonymous_index_names(q, {}, [5]) == q
    assert restore_anonymous_index_names(q, {5: "x"}, []) == q
    assert restore_anonymous_index_names("", {5: "x"}, [5]) == ""


def test_index_restore_add_column_not_counted():
    out = restore_anonymous_index_names(
        "ALTER TABLE t ADD COLUMN c INT, ADD INDEX (c)", {5: "i1"}, [5])
    assert out == "ALTER TABLE t ADD COLUMN c INT, ADD INDEX `i1` (c)"


def test_index_restore_anonymous_constraint_symbol_omitted():
    """ADD CONSTRAINT <kind> with the symbol omitted is ANONYMOUS
    (Name == "" in the reference): it consumes its slot AND renames."""
    out = restore_anonymous_index_names(
        "ALTER TABLE t ADD CONSTRAINT UNIQUE (x), ADD INDEX (b)",
        {5: "u1", 7: "i2"}, [5, 7])
    assert out == ("ALTER TABLE t ADD CONSTRAINT UNIQUE `u1` (x), "
                   "ADD INDEX `i2` (b)")


def test_index_restore_vector_and_columnar_kinds():
    """isIndexConstraint includes ConstraintVector/ConstraintColumnar
    (`ddl_index_rewrite.go:105-124`)."""
    out = restore_anonymous_index_names(
        "ALTER TABLE t ADD VECTOR INDEX (v), ADD INDEX (c)",
        {5: "v1", 7: "i2"}, [5, 7])
    assert out == ("ALTER TABLE t ADD VECTOR INDEX `v1` (v), "
                   "ADD INDEX `i2` (c)")
    out2 = restore_anonymous_index_names(
        "ALTER TABLE t ADD COLUMNAR INDEX (v)", {5: "c1"}, [5])
    assert out2 == "ALTER TABLE t ADD COLUMNAR INDEX `c1` (v)"


def test_index_restore_constraint_foreign_key_no_slot():
    """CONSTRAINT FOREIGN KEY is not an index constraint even though
    KEY follows — the next anonymous index still takes slot 0."""
    out = restore_anonymous_index_names(
        "ALTER TABLE t ADD CONSTRAINT FOREIGN KEY (a) REFERENCES o(b), "
        "ADD INDEX (c)", {5: "i1"}, [5])
    assert out.endswith("ADD INDEX `i1` (c)")
