"""Clean-window ABAB evidence for the r08 dedup_clusters probe fold
(VERDICT r08 "Next round" #1).

A = r07 convergence probe: re-join old labels vs new labels per round.
B = r08 probe: changed-flag folded into the round's existing left join
    (current ticdc_spark.llm.dedup.dedup_clusters).

Both run the full query end to end (construction + noop sink, the
bench.py methodology for this construction-timed query), alternating
A,B,A,B..., N samples each, with /proc/stat steal jiffies logged around
the whole run.  Usage:  python abab_clusters.py [n_samples]
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
from ticdc_spark.llm.dedup import dedup_clusters, minhash_lsh_pairs  # noqa: E402


def dedup_clusters_old_probe(
    docs: DataFrame, threshold: float = 0.8, max_iter: int = 25
) -> DataFrame:
    """Byte-for-byte the r07 (85c4b10) implementation."""
    pairs = minhash_lsh_pairs(docs, threshold).select("a_id", "b_id")
    edges = (
        pairs.union(pairs.select(F.col("b_id").alias("a_id"),
                                 F.col("a_id").alias("b_id")))
        .withColumnRenamed("a_id", "src").withColumnRenamed("b_id", "dst")
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["doc_id"])
            .groupBy("src").agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["doc_id"] == neighbor_min["src"], "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break
    sized = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(sized, "label")
        .select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            "cluster_size",
            (F.col("doc_id") == F.col("label")).alias("is_canonical"),
        )
    )


def steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ticdc_abab_clusters")
    from ticdc_spark.llm_queries import _docs
    from ticdc_spark.sources.changelog import events_changelog

    events_changelog(spark, sf_dir).count()
    spark.range(10000).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(_docs(spark, sf_dir), threshold=0.8).write.format("noop").mode(
            "overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # warm both code paths once (JIT/codegen caches) before timing
    run(dedup_clusters_old_probe)
    run(dedup_clusters)

    s0 = steal_jiffies()
    a, b = [], []
    for i in range(n):
        spark.sparkContext.setJobDescription(f"A old-probe #{i}")
        a.append(run(dedup_clusters_old_probe))
        spark.sparkContext.setJobDescription(f"B new-probe #{i}")
        b.append(run(dedup_clusters))
        print(f"round {i}: A(old)={a[-1]:.3f}  B(new)={b[-1]:.3f}", flush=True)
    out = {
        "samples": n,
        "A_old_probe": a,
        "B_new_probe": b,
        "A_min": min(a), "B_min": min(b),
        "A_median": statistics.median(a), "B_median": statistics.median(b),
        "steal_jiffies_delta": steal_jiffies() - s0,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
