"""sf1 re-test of the table_diff_fix_sql subtree dedup (VERDICT r08
next-round #7; r08 §6 measured it SLOWER at sf0.1 and reverted).

A = declared fix_sql (kinds subtree duplicated into the REPLACE and
    DELETE branches; each broadcast re-computes chunk+row passes).
B = kinds computed once and localCheckpoint'd, both branches broadcast
    the materialized result — the r08 restructure, re-expressed.

Result-set equivalence is asserted per sample (sorted collect compare)
so adopting B could never change what the query computes.

Usage: SPARK_GRAFT_SF_DIR=spark-warehouse/sf1 python abab_diff_sf1.py [n]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from ticdc_spark.session import get_spark  # noqa: E402
from ticdc_spark.plans.table_diff import diff_rows, fix_sql  # noqa: E402


def fix_sql_dedup(
    source: DataFrame, target: DataFrame, pk: str, cols: list[str],
    chunk_size: int, schema_name: str, table_name: str,
) -> DataFrame:
    """fix_sql with the kinds subtree materialized once."""
    kinds = diff_rows(source, target, pk, cols, chunk_size).localCheckpoint()

    def value_sql(df: DataFrame, c: str):
        dt = df.schema[c].dataType.simpleString()
        if dt == "string":
            rendered = F.concat(
                F.lit("'"), F.regexp_replace(F.col(c), "'", "''"),
                F.lit("'"))
        else:
            rendered = F.col(c).cast("string")
        return F.coalesce(rendered, F.lit("NULL"))

    tn = f"`{schema_name}`.`{table_name}`"
    col_list = ",".join(f"`{c}`" for c in cols)
    replace_rows = (
        source.join(F.broadcast(kinds.filter(F.col("kind") != "extra")), pk)
        .select(
            F.col(pk).alias("key"),
            F.concat(
                F.lit(f"REPLACE INTO {tn}({col_list}) VALUES ("),
                F.concat_ws(",", *[value_sql(source, c) for c in cols]),
                F.lit(");")).alias("stmt")))
    delete_rows = (
        target.join(F.broadcast(kinds.filter(F.col("kind") == "extra")), pk)
        .select(
            F.col(pk).alias("key"),
            F.concat(
                F.lit(f"DELETE FROM {tn} WHERE "),
                F.concat_ws(" AND ", *[
                    F.concat(F.lit(f"`{c}` = "), value_sql(target, c))
                    for c in cols]),
                F.lit(";")).alias("stmt")))
    return replace_rows.unionByName(delete_rows)


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "spark-warehouse/sf1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ticdc_abab_diff")
    from ticdc_spark.diff_queries import _pair, _CHUNK, _COLS
    from ticdc_spark.sources.changelog import events_changelog

    events_changelog(spark, "/root/testdata/sf0.1").count()
    spark.range(10000).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode(
        "overwrite").save()

    def build_a() -> DataFrame:
        src, tgt = _pair(spark, sf_dir)
        return fix_sql(src, tgt, "k", _COLS, _CHUNK, "tpch", "orders")

    def build_b() -> DataFrame:
        src, tgt = _pair(spark, sf_dir)
        return fix_sql_dedup(src, tgt, "k", _COLS, _CHUNK, "tpch", "orders")

    # equivalence proof: same rows, same schema
    ra = sorted(map(tuple, build_a().collect()))
    rb = sorted(map(tuple, build_b().collect()))
    assert ra == rb, f"variant B changes results ({len(ra)} vs {len(rb)})"
    print(f"equivalence: {len(ra)} rows identical", flush=True)

    def run(build) -> float:
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    run(build_a); run(build_b)  # warm
    s0 = steal()
    a, b = [], []
    for i in range(n):
        a.append(run(build_a))
        b.append(run(build_b))
        print(f"round {i}: A(dup)={a[-1]:.3f}  B(dedup)={b[-1]:.3f}",
              flush=True)
    print(json.dumps({
        "samples": n, "A_dup_subtree": a, "B_dedup_checkpoint": b,
        "A_min": min(a), "B_min": min(b),
        "A_median": statistics.median(a),
        "B_median": statistics.median(b),
        "steal_jiffies_delta": steal() - s0, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
