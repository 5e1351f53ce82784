"""Cloud-storage disk spool (round 7): budget/quota/codec semantics from
`downstreamadapter/sink/cloudstorage/spool/` and the chaos path — the
object store stalls, the spool absorbs to local disk, the drain
replays; quota overflow answers WAIT_DISK_QUOTA."""

from __future__ import annotations

import os

import pytest

from ticdc_spark.sinks.spool import (
    ACCEPTED,
    ACCEPTED_OVERSIZED,
    WAIT_DISK_QUOTA,
    Spool,
    deserialize_messages,
    serialize_messages,
)


def _msgs(n=1, size=100, rows=5):
    return [(b"k%d" % i, bytes(size), rows) for i in range(n)]


def test_codec_roundtrip_and_corruption_guard():
    msgs = [(b"key", b"value-bytes", 3), (None, b"x" * 50, 1)]
    blob = serialize_messages(msgs)
    got = deserialize_messages(blob)
    assert got == [(b"key", b"value-bytes", 3), (None, b"x" * 50, 1)]
    # codec.go guard: a count field larger than the payload could hold
    import struct

    bad = struct.pack("<I", 10**6) + b"\x00" * 20
    with pytest.raises(ValueError, match="exceeds maximum"):
        deserialize_messages(bad)


def test_memory_then_spill_then_quota(tmp_path):
    # quota 1000: memory quota 200 (ratio .2) — first small entry stays
    # in memory, the next spills to a segment file, quota overflow WAITs
    with Spool("cf", str(tmp_path), disk_quota_bytes=1000) as sp:
        a1, e1 = sp.try_enqueue(_msgs(1, 150))
        assert a1 == ACCEPTED and e1.in_memory() and not e1.is_spilled()
        assert sp.memory_bytes == 152  # key 'k0' (2 bytes) + 150 value
        a2, e2 = sp.try_enqueue(_msgs(1, 300))
        assert a2 == ACCEPTED and e2.is_spilled()
        assert sp.disk_bytes > 0 and sp.segment_count == 1
        assert os.listdir(sp.work_dir)  # segment file on disk
        # next spill would exceed the 1000-byte disk quota
        a3, e3 = sp.try_enqueue(_msgs(1, 900))
        assert a3 == WAIT_DISK_QUOTA and e3 is None
        # release frees room; wait_for_disk_quota succeeds
        sp.release(e2)
        assert sp.wait_for_disk_quota(_msgs(1, 900), timeout=1)
        a4, e4 = sp.try_enqueue(_msgs(1, 900))
        assert a4 == ACCEPTED and e4.is_spilled()
        # read back bit-exact from the segment file
        got = sp.read_messages(e4)
        assert got == _msgs(1, 900)
    assert not os.path.exists(sp.work_dir)  # close removed the dir


def test_oversized_entry_accepted_in_memory(tmp_path):
    with Spool("cf", str(tmp_path), disk_quota_bytes=500) as sp:
        action, entry = sp.try_enqueue(_msgs(1, 600))
        assert action == ACCEPTED_OVERSIZED
        assert entry.in_memory() and not entry.is_spilled()


def test_post_enqueue_pause_resume(tmp_path):
    ran = []
    with Spool("cf", str(tmp_path), disk_quota_bytes=1000) as sp:
        _, e1 = sp.try_enqueue(_msgs(1, 100), post_enqueue=lambda: ran.append(1))
        assert ran == [1]  # below high watermark: runs immediately
        _, e2 = sp.try_enqueue(_msgs(1, 750), post_enqueue=lambda: ran.append(2))
        # total 854 > high watermark 800: callback held
        assert ran == [1]
        sp.release(e2)  # usage drops to ~104 <= low watermark 600
        assert ran == [1, 2]


def test_segment_rotation_and_cleanup(tmp_path):
    with Spool("cf", str(tmp_path), disk_quota_bytes=10_000,
               segment_capacity=300, memory_ratio=0.001) as sp:
        entries = [sp.try_enqueue(_msgs(1, 200))[1] for _ in range(4)]
        assert all(e.is_spilled() for e in entries)
        assert sp.segment_count >= 2  # rolled past 300-byte capacity
        assert sp.rotated_count >= 2
        for e in entries:
            sp.release(e)
        # only the active segment may linger until close
        assert sp.segment_count <= 1


def test_stalled_store_absorbed_then_drained(spark, tmp_path):
    """CHAOS: the S3 endpoint answers 503 SlowDown for the first N PUTs
    (failpoint storage/stall-put); the spool-backed writer keeps
    accepting and parks batches on local disk; once the store recovers
    the final drain lands every object and the consumer replay is
    complete."""
    from pyspark.sql import functions as F

    from ticdc_spark import failpoint
    from ticdc_spark.codec.csv_codec import encode_csv
    from ticdc_spark.sinks.s3_live import (BUCKET, get_files_df, put_files,
                                           start_server)
    from ticdc_spark.sinks.storage import storage_paths
    from ticdc_spark.sources.changelog import events_changelog

    cl = events_changelog(spark, "/root/testdata/sf0.001")
    files = storage_paths(encode_csv(cl), rows_per_file=64)
    n_files = files.select("path", "file_name").distinct().count()
    srv, ak, sk = start_server()
    failpoint.enable("storage/stall-put", "40*return(true)")
    try:
        put_files(files, srv.endpoint, ak, sk,
                  spool_conf={"base-dir": str(tmp_path),
                              "disk-quota": 64 * 1024 * 1024,
                              # tiny memory share forces disk segments
                              "segment-capacity": 256 * 1024})
        fired = failpoint.active().get("storage/stall-put", 0)
        assert fired > 0, "stall failpoint never hit"
    finally:
        failpoint.disable("storage/stall-put")
    got = get_files_df(spark, srv.endpoint, ak, sk)
    assert got.select("path",
                      F.col("value")).count() == cl.count()
    with_client = None  # noqa: F841
    # every (path, file_name) object landed despite the stall window
    from ticdc_spark.sinks.s3_client import S3Client

    c = S3Client(srv.endpoint, ak, sk)
    assert len([k for k, _ in c.list_objects(BUCKET, max_keys=1000)]) == n_files
    c.close()
    srv.stop()


def test_spool_conf_from_changefeed_toml(tmp_path):
    from ticdc_spark.config import parse_changefeed_config
    from ticdc_spark.sinks.s3_live import spool_conf_from_cfg

    cfg = parse_changefeed_config(
        'sink-uri = "s3://b/p?protocol=csv"\n'
        "[sink.cloud-storage-config]\n"
        f'spool-base-dir = "{tmp_path}"\n'
        "spool-disk-quota = 1048576\n")
    conf = spool_conf_from_cfg(cfg)
    assert conf == {"base-dir": str(tmp_path), "disk-quota": 1048576}
    cfg2 = parse_changefeed_config('sink-uri = "s3://b/p?protocol=csv"\n')
    assert spool_conf_from_cfg(cfg2) is None
