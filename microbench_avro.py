"""Microbench: avro encode/decode µs/row for the confluent and debezium
paths (VERDICT r08 next-round #4 — committed evidence artifact).

    python microbench_avro.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ticdc_spark.codec.avro_protocol import (  # noqa: E402
    decode_message,
    encode_row_key,
    encode_row_value,
)
from ticdc_spark.codec.debezium_avro import (  # noqa: E402
    DebeziumAvroCodecCache,
)
from ticdc_spark.codec.schema_registry import (  # noqa: E402
    ConfluentSchemaManager,
    InMemoryConfluentRegistry,
    InMemoryTransport,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000


def mgr():
    return ConfluentSchemaManager(
        "http://registry.local",
        transport=InMemoryTransport(InMemoryConfluentRegistry()))


def bench(label, fn, n=N):
    fn(0)  # warm
    t0 = time.perf_counter()
    for i in range(n):
        fn(i)
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.3f}s total, {dt / n * 1e6:.2f} us/row", flush=True)
    return dt / n * 1e6


out = {}

m = mgr()
rows = [{"id": i, "val": i * 0.5, "k": i * 7} for i in range(N + 1)]
out["confluent_value_encode"] = bench(
    "confluent value encode",
    lambda i: encode_row_value(m, "t", "s", "tbl", rows[i], "U", 1 << 20))
out["confluent_key_encode"] = bench(
    "confluent key encode",
    lambda i: encode_row_key(m, "t", "s", "tbl", rows[i]))
blobs = [encode_row_value(m, "t", "s", "tbl", rows[i], "U", 1 << 20)
         for i in range(N + 1)]
out["confluent_value_decode"] = bench(
    "confluent value decode",
    lambda i: decode_message(m, "t-value", blobs[i]))

# the hot path debezium_avro_roundtrip actually drives: per-subject
# codec cache, wire-JSON encode, fused decode
codec = DebeziumAvroCodecCache(mgr())
dbz_schema = {
    "type": "struct", "name": "dbz.tbl.Envelope", "fields": [
        {"field": "id", "type": "int64"},
        {"field": "val", "type": "double", "optional": True},
        {"field": "k", "type": "int64", "optional": True},
        {"field": "note", "type": "string", "optional": True},
    ],
}
msg_jsons = [json.dumps(
    {"payload": {"id": i, "val": i * 0.5, "k": i * 7, "note": f"n{i}"},
     "schema": dbz_schema}, separators=(",", ":"))
    for i in range(N + 1)]
out["debezium_encode"] = bench(
    "debezium encode (codec cache)",
    lambda i: codec.encode_wire_json(msg_jsons[i], "t", "-value"))
dblobs = [codec.encode_wire_json(msg_jsons[i], "t", "-value")
          for i in range(N + 1)]
out["debezium_decode"] = bench(
    "debezium decode (codec cache)",
    lambda i: codec.decode(dblobs[i], "t-value"))

print(json.dumps({k: round(v, 2) for k, v in out.items()}))
