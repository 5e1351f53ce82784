"""Replay pins for the BatchDMLEvent chunk-payload query.

1. The metadata frames the Python codec emits must be byte-identical
   to the ``dml_event_frames`` query's hex algebra on the same
   changelog grouping (same txn ordering, n_row_keys=0 form).
2. The chunk-roundtrip query's decoded output must reproduce the
   changelog multiset exactly (the driver oracle checks this too; the
   pin here keeps it in the default suite with a row-level diff).
"""

from __future__ import annotations

import pandas as pd

from ticdc_spark.codec.control_events import (
    OP_TO_ROW_TYPE,
    DMLEventMeta,
    encode_dml_event_meta,
)
from ticdc_spark.queries import QUERIES


def test_python_codec_matches_frame_query(spark, sf_dir):
    frames = QUERIES["dml_event_frames"](spark, sf_dir).toPandas()
    cl = QUERIES["changelog_mount"](spark, sf_dir).toPandas()
    cl = cl.sort_values(["table_id", "commit_ts", "start_ts",
                         "dml_order", "seq"])
    got = {}
    for (tid, cts, sts), txn in cl.groupby(
            ["table_id", "commit_ts", "start_ts"], sort=False):
        approx = int((64 + txn["pk"] % 97).sum())
        meta = DMLEventMeta(
            dispatcher_id=(int(tid), 0), physical_table_id=int(tid),
            start_ts=int(sts), commit_ts=int(cts),
            seq=int(txn["seq"].min()), epoch=1, length=len(txn),
            approximate_size=approx, previous_total_offset=0,
            row_types=tuple(OP_TO_ROW_TYPE[o] for o in txn["op"]),
            row_keys=())
        got[(int(tid), int(cts), int(sts))] = \
            encode_dml_event_meta(meta).hex()
    assert len(frames) == len(got)
    for r in frames.itertuples(index=False):
        key = (int(r.table_id), int(r.commit_ts), int(r.start_ts))
        assert got[key] == r.frame_hex, f"frame mismatch for txn {key}"


def test_chunk_roundtrip_is_identity(spark, sf_dir):
    out = QUERIES["dml_event_chunk_roundtrip"](spark, sf_dir).toPandas()
    cl = QUERIES["changelog_mount"](spark, sf_dir).toPandas()
    cols = ["table_id", "op", "commit_ts", "start_ts", "pk",
            "before_id", "before_val", "before_k",
            "after_id", "after_val", "after_k"]
    key = ["table_id", "commit_ts", "start_ts", "pk", "op"]
    a = out[cols].sort_values(key).reset_index(drop=True)
    b = cl[cols].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
