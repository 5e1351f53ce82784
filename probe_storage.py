"""Phase-timing probe for the storage live family (guide §1: measure
first): input-DAG cost vs PUT wall vs LIST wall vs GET+replay wall."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ticdc_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
scheme = sys.argv[1] if len(sys.argv) > 1 else "s3"
n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spark = get_spark("ticdc_probe_storage")

from ticdc_spark.sources.changelog import events_changelog  # noqa: E402

events_changelog(spark, sf_dir).count()
spark.range(10000).repartition(32).mapInPandas(
    lambda it: it, "id long").write.format("noop").mode("overwrite").save()

from ticdc_spark.codec.csv_codec import encode_csv  # noqa: E402
from ticdc_spark.operators import split_updates  # noqa: E402
from ticdc_spark.sinks import s3_live  # noqa: E402
from ticdc_spark.sinks.consumer import decode_csv_storage, replay_to_state  # noqa: E402
from ticdc_spark.sinks.storage import storage_paths  # noqa: E402

for n in range(n_runs):
    cl = split_updates(events_changelog(spark, sf_dir, parallel=True))
    files = storage_paths(encode_csv(cl))
    t0 = time.perf_counter()
    files.write.format("noop").mode("overwrite").save()   # input DAG alone
    t1 = time.perf_counter()
    srv, c1, c2 = s3_live.start_server(scheme)
    t2 = time.perf_counter()
    s3_live.put_files(files, srv.endpoint, c1, c2, scheme=scheme)
    t3 = time.perf_counter()
    with s3_live._client(srv.endpoint, c1, c2, scheme) as c:
        keys = [k for k, _ in c.list_objects(s3_live.BUCKET, max_keys=64)]
    t4 = time.perf_counter()
    fetched = s3_live.get_files_df(spark, srv.endpoint, c1, c2, scheme=scheme)
    out = replay_to_state(decode_csv_storage(fetched), order_col="commit_ts")
    out.write.format("noop").mode("overwrite").save()
    t5 = time.perf_counter()
    print(f"run{n} {scheme}: inputDAG={t1-t0:.3f} srv={t2-t1:.3f} "
          f"put={t3-t2:.3f} list={t4-t3:.3f} ({len(keys)} keys) "
          f"get+replay={t5-t4:.3f}  total(q~)={t5-t1:.3f}", flush=True)
