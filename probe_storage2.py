"""Finer split: GET wave alone vs decode+replay agg; put loop server-side
request count + timings."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ticdc_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
scheme = sys.argv[1] if len(sys.argv) > 1 else "s3"
spark = get_spark("ticdc_probe_storage2")

from ticdc_spark.sources.changelog import events_changelog  # noqa: E402

events_changelog(spark, sf_dir).count()
spark.range(10000).repartition(32).mapInPandas(
    lambda it: it, "id long").write.format("noop").mode("overwrite").save()

from ticdc_spark.codec.csv_codec import encode_csv  # noqa: E402
from ticdc_spark.operators import split_updates  # noqa: E402
from ticdc_spark.sinks import s3_live  # noqa: E402
from ticdc_spark.sinks.consumer import decode_csv_storage, replay_to_state  # noqa: E402
from ticdc_spark.sinks.storage import storage_paths  # noqa: E402

def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


for n in range(5):
    cl = split_updates(events_changelog(spark, sf_dir, parallel=True))
    files = storage_paths(encode_csv(cl))
    srv, c1, c2 = s3_live.start_server(scheme)
    s0 = steal()
    t0 = time.perf_counter()
    s3_live.put_files(files, srv.endpoint, c1, c2, scheme=scheme)
    t1 = time.perf_counter()
    s1 = steal()
    fetched = s3_live.get_files_df(spark, srv.endpoint, c1, c2, scheme=scheme)
    fetched.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    s2 = steal()
    fetched2 = s3_live.get_files_df(spark, srv.endpoint, c1, c2, scheme=scheme)
    out = replay_to_state(decode_csv_storage(fetched2), order_col="commit_ts")
    out.write.format("noop").mode("overwrite").save()
    t3 = time.perf_counter()
    s3 = steal()
    print(f"run{n} {scheme}: put={t1-t0:.3f} (st {s1-s0}) "
          f"getwave={t2-t1:.3f} (st {s2-s1}) "
          f"get+decode+replay={t3-t2:.3f} (st {s3-s2})", flush=True)

# how big is the payload?
tot = 0
with s3_live._client(srv.endpoint, c1, c2, scheme) as c:
    ks = []
    token_count = 0
    keys = [k for k, _ in c.list_objects(s3_live.BUCKET, max_keys=1000)]
    for k in keys[:5]:
        tot += len(c.get_object(s3_live.BUCKET, k))
print(f"{len(keys)} objects, first5 avg={tot/5/1024:.1f} KiB", flush=True)
