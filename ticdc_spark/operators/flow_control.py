"""A3 — flow-control memory accounting: pause/resume hysteresis and the
circuit breaker (SURVEY §2.5 A3).

Reference: `docs/design/2024-12-20-ticdc-flow-control.md:37-52` +
`utils/dynstream` memory control. Per **path** (dispatcher): pause when
memory usage exceeds 20% of quota, resume below 10%. Per **area**
(changefeed, the sum of its paths): pause above 80%, resume below 50%.
Between the thresholds the previous state holds (hysteresis). The
circuit breaker discards events from the longest path when an area
crosses a global threshold.

Spark-first: hysteresis is a *last non-null carry-forward*, not a
sequential loop — emit +pause / -resume marker events at threshold
crossings and take ``last(marker, ignorenulls)`` over an unbounded
preceding row window per path. One window shuffle per level, stays in
JVM whole-stage codegen; the same expression runs on a stream as a
``foreachBatch`` state column. No Python, no recursion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# flow-control design doc :37-47
PATH_PAUSE_PCT, PATH_RESUME_PCT = 20, 10
AREA_PAUSE_PCT, AREA_RESUME_PCT = 80, 50


def usage_samples(
    cl: DataFrame, bucket_us: int = 600_000_000, bytes_per_row: int = 64
) -> DataFrame:
    """Per (area=schema, path=table, tumbling bucket) memory-usage
    samples — the dynstream pendingQueue accounting stand-in. Usage is
    a deterministic per-row byte estimate summed per bucket."""
    bucket = F.expr(f"commit_ts - commit_ts % {bucket_us}")
    return cl.groupBy(
        F.col("schema_name").alias("area"),
        F.col("table_name").alias("path"),
        bucket.alias("bucket_ts"),
    ).agg(
        (F.count(F.lit(1)) * bytes_per_row
         + F.sum(F.pmod(F.col("pk"), F.lit(41)))).alias("usage_bytes")
    )


def _hysteresis(pct: Column, order_cols: list[str], part_cols: list[str],
                pause_pct: int, resume_pct: int) -> Column:
    """paused(i) = pct>pause → 1; pct<resume → 0; else paused(i-1);
    initial state resumed. Expressed as last-non-null marker
    carry-forward (portable: Spark last(ignorenulls) / DuckDB
    last_value IGNORE NULLS)."""
    marker = (
        F.when(pct > pause_pct, F.lit(1))
        .when(pct < resume_pct, F.lit(0))
        .otherwise(F.lit(None))
    )
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.coalesce(F.last(marker, ignorenulls=True).over(w), F.lit(0))


def path_flow_control(samples: DataFrame, quota_bytes: int) -> DataFrame:
    """Path-level pause/resume (20%/10% of quota)."""
    pct = F.expr(f"usage_bytes * 100 div {quota_bytes}")
    return samples.select(
        "area", "path", "bucket_ts", "usage_bytes",
        pct.alias("usage_pct"),
        _hysteresis(pct, ["bucket_ts"], ["area", "path"],
                    PATH_PAUSE_PCT, PATH_RESUME_PCT).alias("path_paused"),
    )


def area_flow_control(samples: DataFrame, quota_bytes: int) -> DataFrame:
    """Area-level pause/resume (80%/50%): usage summed over the area's
    paths per bucket, then the same carry-forward per area.

    Plan note: the carry-forward window holds O(n_time_buckets) rows per
    area (control-plane accounting, time-bounded), partitioned by area.
    A one-schema fixture constant-folds the area key (single-partition
    WindowExec in the printed plan); multi-area input hash-partitions."""
    area = samples.groupBy("area", "bucket_ts").agg(
        F.sum("usage_bytes").alias("usage_bytes")
    )
    pct = F.expr(f"usage_bytes * 100 div {quota_bytes}")
    return area.select(
        "area", "bucket_ts", "usage_bytes",
        pct.alias("usage_pct"),
        _hysteresis(pct, ["bucket_ts"], ["area"],
                    AREA_PAUSE_PCT, AREA_RESUME_PCT).alias("area_paused"),
    )


def circuit_breaker(samples: DataFrame, quota_bytes: int,
                    global_pct: int = 95) -> DataFrame:
    """Circuit breaker (:48-52): when an area's usage crosses the global
    threshold in a bucket, discard from its LONGEST path (max pending
    bytes, ties → path name order). Emits the victim path per breached
    (area, bucket)."""
    area = samples.groupBy("area", "bucket_ts").agg(
        F.sum("usage_bytes").alias("area_bytes")
    ).filter(F.col("area_bytes") * 100 > quota_bytes * global_pct)
    w = Window.partitionBy("area", "bucket_ts").orderBy(
        F.col("usage_bytes").desc(), F.col("path").desc()
    )
    return (
        samples.join(F.broadcast(area), ["area", "bucket_ts"])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "area", "bucket_ts", "area_bytes",
            F.col("path").alias("discard_path"),
            F.col("usage_bytes").alias("discard_bytes"),
        )
    )
