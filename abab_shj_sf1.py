"""sf1 re-test of the SHJ AQE knob (VERDICT r08 next-round #7; r08
measured 0.83-1.06x at sf0.1 and left the default).

A = default (maxShuffledHashJoinLocalMapThreshold=0: SMJ stays SMJ).
B = spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m — AQE
    rewrites SMJ to shuffled-hash at runtime when every post-shuffle
    partition is under the threshold (cannot OOM: size-guarded).

Runs the eight SMJ-heaviest declared queries (rank_smj.py at sf1),
ABAB alternated, noop-sink timed, steal-logged.

Usage: SPARK_GRAFT_SF_DIR=spark-warehouse/sf1 python abab_shj_sf1.py [n]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ticdc_spark.session import get_spark  # noqa: E402

KNOB = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"
QUERY_SET = [
    "table_diff_fix_sql", "dedup_ngram_jaccard_pruned",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "table_diff_sharded",
    "table_diff_rows", "dedup_clusters_star", "curation_pipeline_full",
]


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "spark-warehouse/sf1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ticdc_abab_shj")
    from ticdc_spark.queries import QUERIES
    from ticdc_spark.sources.changelog import events_changelog

    events_changelog(spark, "/root/testdata/sf0.1").count()
    spark.range(10000).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode(
        "overwrite").save()

    def run(name: str, knob: str) -> float:
        spark.conf.set(KNOB, knob)
        try:
            df = QUERIES[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)
        finally:
            spark.conf.unset(KNOB)

    for q in QUERY_SET:  # warm both variants once
        run(q, "0"); run(q, "64m")
    s0 = steal()
    out = {}
    for q in QUERY_SET:
        a, b = [], []
        for _ in range(n):
            a.append(run(q, "0"))
            b.append(run(q, "64m"))
        out[q] = {"A_smj": a, "B_shj": b,
                  "A_min": min(a), "B_min": min(b),
                  "speedup_min": round(min(a) / min(b), 3),
                  "A_median": statistics.median(a),
                  "B_median": statistics.median(b)}
        print(f"{q}: SMJ min {min(a):.3f} / SHJ min {min(b):.3f} "
              f"({out[q]['speedup_min']}x)", flush=True)
    print(json.dumps({"samples": n, "sf_dir": sf_dir,
                      "steal_jiffies_delta": steal() - s0,
                      "per_query": out}))


if __name__ == "__main__":
    main()
