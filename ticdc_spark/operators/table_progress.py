"""A5 — per-table progress tracking.

Reference: `downstreamadapter/dispatcher/table_progress.go` — each
dispatcher keeps the (commitTs, startTs) pairs of in-flight (added but
not yet flushed) events and answers:

- ``GetCheckpointTs`` (`:172-183`): earliest unflushed commitTs − 1 when
  events are in flight, else maxCommitTs − 1, else 0;
- ``GetLastSyncedTs`` (`:185-191`): the largest flushed commitTs (never
  moves backwards);
- ``Empty``/``Len``: in-flight inventory.

Spark shape: the sink flushes a strict prefix of the (commit_ts,
start_ts, seq) order within each table, so "flushed" is a rank
predicate against a flush frontier, and every progress figure is one
per-table aggregate over that split — a single shuffle on the table
key, no ordered state machine needed. At 1M tables this is exactly the
per-key aggregation Spark already scales; the reference needs the
linked-list machinery only because it tracks progress event-by-event
inside one process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def flush_frontier(cl: DataFrame, flushed_fraction: float) -> DataFrame:
    """Mark the flushed prefix: within each table, the first
    ``flushed_fraction`` of events in (commit_ts, start_ts, seq) order
    count as flushed to the downstream — the deterministic stand-in for
    the sink's flush callbacks (`table_progress.go:97-114` Add registers
    the callback; remove `:116-136` fires on flush)."""
    w = Window.partitionBy("schema_name", "table_name").orderBy(
        "commit_ts", "start_ts", "seq")
    wn = Window.partitionBy("schema_name", "table_name")
    return (
        cl.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .withColumn(
            "flushed",
            F.col("_rk") <= F.floor(F.col("_n") * F.lit(flushed_fraction)))
        .drop("_rk", "_n")
    )


def table_progress(marked: DataFrame) -> DataFrame:
    """Fold the marked changelog to one progress row per table."""
    unflushed_min = F.min(
        F.when(~F.col("flushed"), F.col("commit_ts"))).alias("_min_unflushed")
    flushed_max = F.max(
        F.when(F.col("flushed"), F.col("commit_ts"))).alias("_max_flushed")
    agg = marked.groupBy("schema_name", "table_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(~F.col("flushed"), 1).otherwise(0)).alias("n_inflight"),
        F.max("commit_ts").alias("_max_commit"),
        unflushed_min,
        flushed_max,
    )
    return agg.select(
        "schema_name", "table_name", "n_events",
        F.col("n_inflight").cast("long").alias("n_inflight"),
        # GetCheckpointTs: min unflushed − 1, else max seen − 1, else 0
        F.coalesce(
            F.col("_min_unflushed") - 1,
            F.col("_max_commit") - 1,
            F.lit(0),
        ).alias("checkpoint_ts"),
        # GetLastSyncedTs: largest flushed commit ts (0 before any flush)
        F.coalesce(F.col("_max_flushed"), F.lit(0)).alias("last_synced_ts"),
        F.col("_max_commit").alias("max_commit_ts"),
        (F.col("n_inflight") == 0).alias("empty"),
    )
