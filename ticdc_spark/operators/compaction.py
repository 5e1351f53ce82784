"""A1 — changelog compaction (the 6-case batch fold).

Reference: `pkg/sink/mysql/mysql_writer_dml_batch.go:27-190`. Within a
flush batch, events for the same primary key fold to a net effect:

    first=I, last=D  → nothing (row created and destroyed in-batch)
    first=I, last∈{I,U} → INSERT with the last after-image
    first∈{U,D}, last=D → DELETE with the first before-image
    otherwise (U/D then I/U) → UPDATE(first.before → last.after)

Spark-first: ``groupBy(table, pk).agg(min_by/max_by)`` — ONE shuffle with
map-side partial aggregation (far cheaper at 100 TB than a window
row_number, which must fully sort every partition). ``commit_ts`` is the
total order within a key (unique per event by construction; the reference
orders by (commitTs, startTs, DMLOrder) — `eventstore/format.go:33-56`).

NULL discipline: the first/last images extracted by min_by/max_by are
only exposed when the net op actually uses them (net I → after only,
net D → before only, net U → both); by the fold's case analysis those
rows are guaranteed to carry non-null images, which also makes the result
portable across engines whose arg_min/arg_max differ on NULL handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_changelog(cl: DataFrame, keys: list[str] | None = None) -> DataFrame:
    keys = keys or ["schema_name", "table_name", "table_id", "pk"]
    payload_fields = [f.name for f in cl.schema["after"].dataType.fields]
    dml = cl.filter(F.col("op").isin("I", "U", "D"))
    # Scalar (per-field) min_by/max_by instead of struct-valued ones:
    # struct aggregates force ObjectHashAggregate (no codegen, spill-prone);
    # per-field extraction at the extremum row is semantically identical
    # because an image struct is NULL iff all its fields are.
    # Aggregate the numeric op code (dml_order: D=1,U=2,I=3) instead of the
    # op string: string-valued min_by buffers force SortAggregate (per-
    # partition sort); all-numeric buffers keep the plan in HashAggregate.
    g = dml.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("commit_ts").alias("first_ts"),
        F.max("commit_ts").alias("last_ts"),
        F.min_by("dml_order", "commit_ts").alias("_first_code"),
        F.max_by("dml_order", "commit_ts").alias("_last_code"),
        *[F.min_by(f"before.{f}", "commit_ts").alias(f"_fb_{f}") for f in payload_fields],
        *[F.max_by(f"after.{f}", "commit_ts").alias(f"_la_{f}") for f in payload_fields],
    )
    code_to_op = {1: "D", 2: "U", 3: "I"}
    for src, dst in (("_first_code", "first_op"), ("_last_code", "last_op")):
        expr = F.lit(None).cast("string")
        for code, op in code_to_op.items():
            expr = F.when(F.col(src) == code, F.lit(op)).otherwise(expr)
        g = g.withColumn(dst, expr)
    import functools
    import operator as _op

    def any_nonnull(prefix: str):
        return functools.reduce(
            _op.or_, [F.col(f"{prefix}{f}").isNotNull() for f in payload_fields]
        )

    g = g.withColumn(
        "first_before",
        F.when(any_nonnull("_fb_"),
               F.struct(*[F.col(f"_fb_{f}").alias(f) for f in payload_fields])),
    ).withColumn(
        "last_after",
        F.when(any_nonnull("_la_"),
               F.struct(*[F.col(f"_la_{f}").alias(f) for f in payload_fields])),
    )
    net_op = (
        F.when((F.col("first_op") == "I") & (F.col("last_op") == "D"), F.lit(None))
        .when(F.col("first_op") == "I", F.lit("I"))
        .when(F.col("last_op") == "D", F.lit("D"))
        .otherwise(F.lit("U"))
    )
    out = (
        g.withColumn("net_op", net_op)
        .filter(F.col("net_op").isNotNull())
        .select(
            *keys,
            "net_op",
            "n_events",
            F.col("last_ts").alias("commit_ts"),
            F.when(F.col("net_op").isin("U", "D"), F.col("first_before")).alias("before"),
            F.when(F.col("net_op").isin("I", "U"), F.col("last_after")).alias("after"),
        )
    )
    return out


def compact_changelog_salted(
    cl: DataFrame, keys: list[str] | None = None, n_salts: int = 16
) -> DataFrame:
    """Skew-resistant two-phase fold (reference's span-splitting R7 /
    AQE-skew analog): phase 1 folds per (key, salt) — spreading a hot key
    over ``n_salts`` reducers — phase 2 combines the salt-partials.

    The fold composes because min_by/max_by are associative over the
    ordering column: the salt-partial holding the globally-extreme
    commit_ts holds the globally-extreme values (commit_ts is unique).
    Produces EXACTLY the same rows as ``compact_changelog`` (shared
    oracle in the query registry proves it).
    """
    keys = keys or ["schema_name", "table_name", "table_id", "pk"]
    payload_fields = [f.name for f in cl.schema["after"].dataType.fields]
    dml = cl.filter(F.col("op").isin("I", "U", "D")).withColumn(
        "_salt", (F.col("seq") % n_salts).cast("int")
    )
    p1 = dml.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("p_n"),
        F.min("commit_ts").alias("p_first_ts"),
        F.max("commit_ts").alias("p_last_ts"),
        F.min_by("dml_order", "commit_ts").alias("p_first_code"),
        F.max_by("dml_order", "commit_ts").alias("p_last_code"),
        *[F.min_by(f"before.{f}", "commit_ts").alias(f"p_fb_{f}") for f in payload_fields],
        *[F.max_by(f"after.{f}", "commit_ts").alias(f"p_la_{f}") for f in payload_fields],
    )
    g = p1.groupBy(*keys).agg(
        F.sum("p_n").alias("n_events"),
        F.min("p_first_ts").alias("first_ts"),
        F.max("p_last_ts").alias("last_ts"),
        F.min_by("p_first_code", "p_first_ts").alias("_first_code"),
        F.max_by("p_last_code", "p_last_ts").alias("_last_code"),
        *[F.min_by(f"p_fb_{f}", "p_first_ts").alias(f"_fb_{f}") for f in payload_fields],
        *[F.max_by(f"p_la_{f}", "p_last_ts").alias(f"_la_{f}") for f in payload_fields],
    )
    code_to_op = {1: "D", 2: "U", 3: "I"}
    for src, dst in (("_first_code", "first_op"), ("_last_code", "last_op")):
        expr = F.lit(None).cast("string")
        for code, op in code_to_op.items():
            expr = F.when(F.col(src) == code, F.lit(op)).otherwise(expr)
        g = g.withColumn(dst, expr)

    import functools
    import operator as _op

    def any_nonnull(prefix: str):
        return functools.reduce(
            _op.or_, [F.col(f"{prefix}{f}").isNotNull() for f in payload_fields]
        )

    g = g.withColumn(
        "first_before",
        F.when(any_nonnull("_fb_"),
               F.struct(*[F.col(f"_fb_{f}").alias(f) for f in payload_fields])),
    ).withColumn(
        "last_after",
        F.when(any_nonnull("_la_"),
               F.struct(*[F.col(f"_la_{f}").alias(f) for f in payload_fields])),
    )
    net_op = (
        F.when((F.col("first_op") == "I") & (F.col("last_op") == "D"), F.lit(None))
        .when(F.col("first_op") == "I", F.lit("I"))
        .when(F.col("last_op") == "D", F.lit("D"))
        .otherwise(F.lit("U"))
    )
    return (
        g.withColumn("net_op", net_op)
        .filter(F.col("net_op").isNotNull())
        .select(
            *keys,
            "net_op",
            "n_events",
            F.col("last_ts").alias("commit_ts"),
            F.when(F.col("net_op").isin("U", "D"), F.col("first_before")).alias("before"),
            F.when(F.col("net_op").isin("I", "U"), F.col("last_after")).alias("after"),
        )
    )
