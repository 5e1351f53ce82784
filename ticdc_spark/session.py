"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; the same config block is what we would
ship to a 1000-executor cluster (AQE on, UTC, Arrow) — only master/memory
and ``spark.sql.shuffle.partitions`` change with cluster size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ticdc_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # default 1g fails any full-result collect past ~2.5M rows — the
        # sf1 differential sweep collects whole changelog-sized outputs
        # into the oracle compare (correctness tooling, not a data-path
        # collect; the engine's own operators never collect at scale)
        .config("spark.driver.maxResultSize",
                os.environ.get("SPARK_GRAFT_MAX_RESULT", "8g"))
        # UI off by default (port + thread cost in tests); bench enables
        # it to read shuffle-write bytes from the status REST API
        .config("spark.ui.enabled",
                "true" if os.environ.get("SPARK_GRAFT_UI") == "1"
                else "false")
        # keep byte counters stable across a whole bench probe (the
        # default store evicts at 1000 stages and deltas go negative)
        .config("spark.ui.retainedStages", "100000")
        .config("spark.sql.parquet.filterPushdown", "true")
        # local mode defaults to task maxFailures=1: one transient Python
        # worker death (co-tenant memory spike on this host) aborts the
        # whole job.  A real cluster runs with 4; match it so a single
        # worker crash retries instead of failing the bench/suite run.
        .config("spark.task.maxFailures", "4")
        .config("spark.python.worker.faulthandler.enabled", "true")
        # testdata parquet stores TIMESTAMP(NANOS); Spark reads them as
        # LongType nanos under this flag (sources/changelog.py converts).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
