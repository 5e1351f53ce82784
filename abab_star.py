"""Per-round plan capture + ABAB for the large-star/small-star
restructure (VERDICT r08 next-round #5).

A = r08 round body (groupBy + join-back per star, inlined below).
B = r09 round body (min-over-window, current connected_components_star).

Captures one round's .explain('formatted') for each variant into
plans/r09/dedup_clusters_star_round_{before,after}.txt and ABABs the
full dedup_clusters_star query wall (construction + noop, the bench
methodology), steal-logged.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from ticdc_spark.session import get_spark  # noqa: E402
from ticdc_spark.llm.dedup import (  # noqa: E402
    dedup_clusters_star,
    minhash_lsh_pairs,
)


def round_old(edges: DataFrame) -> DataFrame:
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    lmin = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("mn"))
    ls = (sym.join(lmin, "src")
          .filter(F.col("dst") > F.col("src"))
          .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
          .distinct())
    smin = ls.groupBy("src").agg(F.min("dst").alias("mn"))
    j = ls.join(smin, "src")
    return (j.filter(F.col("dst") != F.col("mn"))
            .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
            .union(j.select("src", F.col("mn").alias("dst")))
            .distinct())


def round_new(edges: DataFrame) -> DataFrame:
    w_src = Window.partitionBy("src")
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    lw = sym.withColumn(
        "mn", F.least(F.min("dst").over(w_src), F.col("src")))
    ls = (lw.filter(F.col("dst") > F.col("src"))
          .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
          .distinct())
    sw = ls.withColumn("mn", F.min("dst").over(w_src))
    return (sw.filter(F.col("dst") != F.col("mn"))
            .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
            .union(sw.select("src", F.col("mn").alias("dst")))
            .distinct())


def dedup_clusters_star_old(docs, threshold=0.8, max_iter=10):
    """r08 connected_components_star with the old round body."""
    pairs = minhash_lsh_pairs(docs, threshold).select("a_id", "b_id")
    verts = (pairs.select(F.col("a_id").alias("doc_id"))
             .union(pairs.select(F.col("b_id").alias("doc_id")))
             .distinct().localCheckpoint())
    edges = (pairs.select(F.greatest("a_id", "b_id").alias("src"),
                          F.least("a_id", "b_id").alias("dst"))
             .distinct().localCheckpoint())
    for _ in range(max_iter):
        new_edges = round_old(edges).localCheckpoint()
        changed = (new_edges.withColumn("_n", F.lit(1))
                   .join(edges.withColumn("_o", F.lit(1)), ["src", "dst"],
                         "full_outer")
                   .filter(F.col("_n").isNull() | F.col("_o").isNull())
                   .limit(1).count())
        edges = new_edges
        if changed == 0:
            break
    labels = edges.groupBy(F.col("src").alias("doc_id")).agg(
        F.min("dst").alias("cluster_id"))
    roots = verts.join(edges.select(F.col("src").alias("doc_id")),
                       "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("cluster_id"))
    lab = labels.union(roots)
    sized = lab.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return lab.join(sized, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"))


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ticdc_abab_star")
    from ticdc_spark.llm_queries import _docs
    from ticdc_spark.sources.changelog import events_changelog

    events_changelog(spark, sf_dir).count()
    spark.range(10000).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode(
        "overwrite").save()

    # -- one-round plan capture over the real edge set
    pairs = minhash_lsh_pairs(_docs(spark, sf_dir), 0.8).select("a_id", "b_id")
    edges = (pairs.select(F.greatest("a_id", "b_id").alias("src"),
                          F.least("a_id", "b_id").alias("dst"))
             .distinct().localCheckpoint())
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "plans", "r09")
    os.makedirs(out_dir, exist_ok=True)
    for tag, fn in (("before", round_old), ("after", round_new)):
        df = fn(edges)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(
                out_dir, f"dedup_clusters_star_round_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"round {tag}: {plan.count('+- Exchange')} Exchange, "
              f"{plan.count('+- Window')} Window, "
              f"{plan.count('Join')} Join-ish", flush=True)

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(_docs(spark, sf_dir), threshold=0.8).write.format("noop").mode(
            "overwrite").save()
        return round(time.perf_counter() - t0, 3)

    run(dedup_clusters_star_old)
    run(dedup_clusters_star)
    s0 = steal()
    a, b = [], []
    for i in range(n):
        a.append(run(dedup_clusters_star_old))
        b.append(run(dedup_clusters_star))
        print(f"round {i}: A(old)={a[-1]:.3f}  B(new)={b[-1]:.3f}",
              flush=True)
    print(json.dumps({
        "samples": n, "A_old": a, "B_new": b,
        "A_min": min(a), "B_min": min(b),
        "A_median": statistics.median(a),
        "B_median": statistics.median(b),
        "steal_jiffies_delta": steal() - s0, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
