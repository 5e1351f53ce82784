"""Rank declared queries by SortMergeJoin count in the sf1 plan —
picks the candidate set for the SHJ AQE-knob re-test (VERDICT #7)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ticdc_spark.session import get_spark  # noqa: E402

LIVE = {
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "spark-warehouse/sf1"
    spark = get_spark("rank_smj")
    from ticdc_spark.queries import QUERIES
    rows = []
    for n in sorted(QUERIES):
        if n in LIVE or "live" in n or "_from_toml" in n:
            continue
        try:
            df = QUERIES[n](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            print(f"SKIP {n}: {exc!r}"[:120], flush=True)
            continue
        smj = plan.count("SortMergeJoin")
        ex = plan.count("Exchange")
        if smj:
            rows.append((smj, ex, n))
    rows.sort(reverse=True)
    for smj, ex, n in rows[:25]:
        print(f"{smj:3d} SMJ {ex:3d} Ex  {n}")


if __name__ == "__main__":
    main()
