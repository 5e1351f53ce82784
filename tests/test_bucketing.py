"""Scale design proof: bucketed tables co-locate the join/fold keys so
repeated per-key work (conflict slots A4, compaction A1, state joins)
runs WITHOUT an exchange — the Spark analog of the reference's pre-
partitioned table spans (R7). At 100 TB this is the difference between
re-shuffling the firehose per stage and shuffling once at ingest."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ticdc_spark.sources.changelog import events_changelog


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    cl = events_changelog(spark, sf_dir).select(
        "schema_name", "table_name", "pk", "op", "commit_ts", "seq",
        F.col("after.val").alias("after_val"),
    )
    for name, df in (
        ("cl_bucketed", cl),
        ("state_bucketed",
         cl.groupBy("pk").agg(F.max("commit_ts").alias("state_ts"))),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "pk").sortBy("pk")
            .option("path", str(base / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield
    for name in ("cl_bucketed", "state_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_exchange(spark, bucketed):
    # At test SF the state side is broadcast-sized and the planner rightly
    # skips bucketing; disable broadcast to exercise the 100 TB shape
    # (both sides too big to broadcast → bucketed sort-merge, no shuffle).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("cl_bucketed").join(spark.table("state_bucketed"), "pk")
        plan = _executed_plan(j)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_fold_no_exchange(spark, bucketed):
    g = (
        spark.table("cl_bucketed")
        .groupBy("pk")
        .agg(F.max_by("after_val", "commit_ts").alias("last_val"),
             F.count(F.lit(1)).alias("n"))
    )
    plan = _executed_plan(g)
    assert "Exchange" not in plan, plan
    assert g.count() > 0


def test_unbucketed_join_does_shuffle(spark, sf_dir, bucketed):
    """Control: the same join off the raw parquet NEEDS two exchanges —
    what bucketing removed."""
    cl = events_changelog(spark, sf_dir).select("pk", "commit_ts")
    st = cl.groupBy("pk").agg(F.max("commit_ts").alias("state_ts"))
    plan = _executed_plan(cl.join(st, "pk"))
    assert "Exchange" in plan
