"""O3 — scan limits, txn scan strategies, and resumable scan cursors.

Reference: the event scanner bounds each scan by ``scanLimit``
(`pkg/eventservice/event_scanner.go:47-56`) and publishes an immutable
``scanProgress`` resume point with exactly three meaningful forms
(`pkg/eventservice/scan_progress.go:27-33`):

- ``(C, 0, nil)`` — everything through commitTs C is complete,
- ``(C, S, nil)`` — transaction (S, C) is complete,
- ``(C, S, P)`` — resume transaction (S, C) after row position P.

Whether a transaction may straddle two scans is the txn scan strategy
(`pkg/eventservice/txn_scan_strategy.go:91-102`): *atomic* finishes the
current transaction before stopping; *split* may stop mid-txn and
resumes from the row-level position.

Spark-first design: chunk assignment is pure window algebra over the
replay order (O1 keys) — one shuffle on ``table_id``, whole-stage
codegen, no driver loop. Cursors per chunk are a tiny aggregate
(one row per chunk) joined back against per-txn / per-commit-ts chunk
spans; at 100 TB those aggregates are thousands of rows, broadcast-size
by construction. The scan-rank window reuses the same ``table_id``
partitioning as the ordered sink path, so Catalyst schedules one
exchange for both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ticdc_spark.operators.ordering import SORT_KEYS


def chunk_scan_split(cl: DataFrame, max_rows: int) -> DataFrame:
    """Split strategy: chunks are exact ``max_rows`` slices of the
    per-table replay order; a transaction MAY straddle chunks (the
    cursor then carries a row-level position)."""
    w = Window.partitionBy("table_id").orderBy(*[F.col(k) for k in SORT_KEYS])
    rn = F.row_number().over(w)
    return cl.withColumn("scan_rn", rn).withColumn(
        "chunk", ((F.col("scan_rn") - 1) / max_rows).cast("long")
    )


def chunk_scan_atomic(cl: DataFrame, max_rows: int) -> DataFrame:
    """Atomic strategy: a transaction (commit_ts, start_ts) never spans
    chunks — it lands in the chunk its FIRST row falls into, so a chunk
    absorbs whole transactions and may overshoot ``max_rows`` (the
    reference's atomic scanner likewise emits r1..r3 before stopping,
    `txn_scan_strategy.go:33-35`).

    Plan note: the rank window partitions by ``table_id`` — one ordered
    sequence PER SPAN, exactly the reference's per-span iterator.  A
    single-table fixture whose table_id is a literal constant-folds the
    partition key away (Catalyst), which prints a single-partition
    WindowExec; with real multi-span input the exchange hash-partitions
    (pinned by test_plan_quality)."""
    w = Window.partitionBy("table_id").orderBy(*[F.col(k) for k in SORT_KEYS])
    wtxn = Window.partitionBy("table_id", "commit_ts", "start_ts")
    rn = F.row_number().over(w)
    first_rn = F.min(F.col("scan_rn")).over(wtxn)
    return (
        cl.withColumn("scan_rn", rn)
        .withColumn("chunk", ((first_rn - 1) / max_rows).cast("long"))
    )


def scan_cursors(chunked: DataFrame) -> DataFrame:
    """The published resume point after each chunk, in the reference's
    three forms. ``form`` is ``row`` when the chunk tail stopped inside
    a transaction that continues in a later chunk, ``txn`` when the tail
    transaction is complete but its commitTs boundary is not, and
    ``boundary`` when everything through cursor_commit_ts is done
    (cursor_start_ts collapses to 0, matching `scan_progress.go:29`)."""
    tail_ord = F.col("scan_rn")
    tails = chunked.groupBy("table_id", "chunk").agg(
        F.max_by(F.col("commit_ts"), tail_ord).alias("tail_commit_ts"),
        F.max_by(F.col("start_ts"), tail_ord).alias("tail_start_ts"),
        F.max_by(F.col("dml_order"), tail_ord).alias("tail_dml_order"),
        F.max_by(F.col("seq"), tail_ord).alias("tail_seq"),
        F.count(F.lit(1)).alias("chunk_rows"),
    )
    txn_span = chunked.groupBy("table_id", "commit_ts", "start_ts").agg(
        F.max("chunk").alias("txn_max_chunk")
    ).select(
        F.col("table_id").alias("t_tid"),
        F.col("commit_ts").alias("t_cts"),
        F.col("start_ts").alias("t_sts"),
        "txn_max_chunk",
    )
    ts_span = chunked.groupBy("table_id", "commit_ts").agg(
        F.max("chunk").alias("ts_max_chunk")
    ).select(
        F.col("table_id").alias("c_tid"),
        F.col("commit_ts").alias("c_cts"),
        "ts_max_chunk",
    )
    joined = (
        tails.join(
            F.broadcast(txn_span),
            (F.col("table_id") == F.col("t_tid"))
            & (F.col("tail_commit_ts") == F.col("t_cts"))
            & (F.col("tail_start_ts") == F.col("t_sts")),
        )
        .join(
            F.broadcast(ts_span),
            (F.col("table_id") == F.col("c_tid"))
            & (F.col("tail_commit_ts") == F.col("c_cts")),
        )
        .drop("t_tid", "t_cts", "t_sts", "c_tid", "c_cts")
    )
    form = (
        F.when(F.col("txn_max_chunk") > F.col("chunk"), F.lit("row"))
        .when(F.col("ts_max_chunk") > F.col("chunk"), F.lit("txn"))
        .otherwise(F.lit("boundary"))
    )
    return joined.select(
        "table_id",
        "chunk",
        "chunk_rows",
        F.col("tail_commit_ts").alias("cursor_commit_ts"),
        F.when(form != "boundary", F.col("tail_start_ts"))
        .otherwise(F.lit(0))
        .alias("cursor_start_ts"),
        # the row-level position is (dml_order, seq) — the within-txn
        # replay order (the reference's opaque EventStore ScanPosition
        # is likewise the full sort key, `eventstore/format.go:33-56`)
        F.when(form == "row", F.col("tail_dml_order")).alias("cursor_dml_order"),
        F.when(form == "row", F.col("tail_seq")).alias("cursor_pos"),
        form.alias("form"),
    )


def resume_after(
    cl: DataFrame, table_id: int, cursor_commit_ts: int,
    cursor_start_ts: int, cursor_pos: int | None,
    cursor_dml_order: int | None = None,
) -> DataFrame:
    """EventStore iterator bounds for a resumed scan: strictly after the
    cursor in replay order. A row-level position resumes INSIDE the
    pending transaction (`scan_progress.go:21-24` — publishing (C, S,
    nil) instead would skip its remaining rows). Within the txn the
    position is lexicographic on (dml_order, seq)."""
    if cursor_start_ts == 0:
        # (C, 0, nil): resolved boundary — everything through C is done
        # (`scan_progress.go:29`); the next scan opens strictly above C.
        after_boundary = F.col("commit_ts") > cursor_commit_ts
    else:
        after_boundary = (F.col("commit_ts") > cursor_commit_ts) | (
            (F.col("commit_ts") == cursor_commit_ts)
            & (F.col("start_ts") > cursor_start_ts)
        )
    if cursor_pos is not None:
        dml = 0 if cursor_dml_order is None else cursor_dml_order
        in_txn = (
            (F.col("commit_ts") == cursor_commit_ts)
            & (F.col("start_ts") == cursor_start_ts)
            & (
                (F.col("dml_order") > dml)
                | ((F.col("dml_order") == dml) & (F.col("seq") > cursor_pos))
            )
        )
        after_boundary = after_boundary | in_txn
    return cl.filter((F.col("table_id") == table_id) & after_boundary)
