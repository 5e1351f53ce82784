"""Targeted per-query timing for optimization work (round 8).

Same methodology as bench.py (construction-timed set, noop sink,
min-of-N samples) but for an explicit query list:

    python minibench.py kafka_live_roundtrip pipeline_live_end_to_end

Prints one line per query plus a JSON tail.  NOT part of the driver
contract — bench.py stays the published artifact generator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ticdc_spark.session import get_spark  # noqa: E402

CONSTRUCT_TIMED = {
    "bpe_train_merges", "kafka_live_roundtrip", "mysql_live_apply",
    "pulsar_live_roundtrip", "pipeline_live_end_to_end",
    "mysql_live_apply_prepared", "kafka_consumer_group_roundtrip",
    "storage_live_s3_roundtrip", "avro_live_registry_roundtrip",
    "kafka_list_offsets_by_ts", "storage_live_gcs_roundtrip",
    "storage_live_azblob_roundtrip", "kafka_live_gssapi_roundtrip",
    "storage_live_multipart_roundtrip", "mysql_live_apply_generated_column",
    "storage_live_spool_roundtrip", "kafka_live_raw_change_event",
    "pq_trained_rerank_recall", "vector_changefeed_ann",
    "dedup_clusters", "dedup_clusters_keep_best",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_samples = int(os.environ.get("MINIBENCH_SAMPLES", "2"))
    names = sys.argv[1:]
    spark = get_spark("ticdc_minibench")
    from ticdc_spark.queries import QUERIES
    from ticdc_spark.sources.changelog import events_changelog

    # same warmup as bench.py
    events_changelog(spark, sf_dir).count()
    spark.range(10000).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode(
        "overwrite").save()

    def time_query(name: str) -> float:
        if name in CONSTRUCT_TIMED:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            return round(time.perf_counter() - t0, 3)
        df = QUERIES[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(n_samples):
            t = time_query(name)
            best = t if best is None else min(best, t)
        out[name] = best
        print(f"{best:8.3f}  {name}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
