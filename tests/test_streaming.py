"""Streaming changefeed: availableNow run == batch pipeline; barrier split."""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

from ticdc_spark.pipeline import ChangefeedConfig, build_pipeline
from ticdc_spark.sources.changelog import events_changelog
from ticdc_spark.streaming import Changefeed, split_batch_at_ddl


def test_changefeed_stream_matches_batch(spark, sf_dir, tmp_path):
    cfg = ChangefeedConfig(
        filter_rules=["*.*", "!test.tp_view"],
        dispatchers=[{"matcher": ["test.tp_*"], "partition": "index-value",
                      "topic": "cdc_{schema}_{table}"}],
        protocol="canal-json",
    )
    cf = Changefeed("cf_test", cfg, str(tmp_path))
    cf.start(spark, sf_dir, available_now=True)
    cf.wait(240)

    out_files = glob.glob(f"{cf.sink_dir}/**/*.json", recursive=True)
    assert out_files, "streaming sink wrote no files"
    streamed = spark.read.json(f"{cf.sink_dir}/epoch=*")

    batch = build_pipeline(events_changelog(spark, sf_dir), cfg)
    assert streamed.count() == batch.count()
    # Same multiset of encoded messages.
    a = {r["value"] for r in streamed.select("value").collect()}
    b = {r["value"] for r in batch.select("value").collect()}
    assert a == b

    # Progress log advanced the resolved ts (A2/W1).
    ckpt = cf.checkpoint_ts()
    expected = batch.agg(F.max("commit_ts")).collect()[0][0]
    assert ckpt == expected


def test_changefeed_resume_is_idempotent(spark, sf_dir, tmp_path):
    """Restart with the same checkpoint reprocesses nothing (offsets kept)."""
    cfg = ChangefeedConfig(protocol="csv", split_updates=False)
    cf = Changefeed("cf_resume", cfg, str(tmp_path))
    cf.start(spark, sf_dir, available_now=True)
    cf.wait(240)
    n1 = spark.read.json(f"{cf.sink_dir}/epoch=*").count()
    cf2 = Changefeed("cf_resume", cfg, str(tmp_path))
    cf2.start(spark, sf_dir, available_now=True)
    cf2.wait(240)
    n2 = spark.read.json(f"{cf.sink_dir}/epoch=*").count()
    assert n1 == n2 > 0


def test_ddl_barrier_split(spark, sf_dir):
    cl = events_changelog(spark, sf_dir).select("commit_ts", "seq").limit(500)
    rows = cl.collect()
    ts_sorted = sorted(r["commit_ts"] for r in rows)
    ddl_ts = ts_sorted[len(ts_sorted) // 2]

    flushed: list[tuple[int, int]] = []
    ddls: list[int] = []
    split_batch_at_ddl(
        cl,
        [ddl_ts],
        lambda df, seg: flushed.append((seg, df.count())),
        lambda ts: ddls.append(ts),
    )
    assert ddls == [ddl_ts]
    assert len(flushed) == 2
    assert flushed[0][1] + flushed[1][1] == len(rows)
    # pre-segment contains exactly the rows <= ddl_ts
    assert flushed[0][1] == sum(1 for r in rows if r["commit_ts"] <= ddl_ts)


def test_resolved_frames_written_per_epoch(spark, sf_dir, tmp_path):
    """W1 wire artifact: each epoch leaves one BatchResolvedEvent frame
    whose per-dispatcher watermarks agree with the progress log."""
    import glob
    import json
    import os

    from ticdc_spark.codec.resolved_event import decode_batch
    from ticdc_spark.pipeline import ChangefeedConfig
    from ticdc_spark.streaming.changefeed import Changefeed

    cfg = ChangefeedConfig(protocol="canal-json")
    cf = Changefeed("cf_resolved", cfg, str(tmp_path))
    cf.start(spark, sf_dir, available_now=True)
    cf.wait(240)
    frames = sorted(glob.glob(
        os.path.join(str(tmp_path), "resolved", "cf_resolved", "*.bin")))
    assert frames
    progress = [json.loads(ln) for ln in open(cf.progress_path)]
    by_epoch = {p["epoch"]: p for p in progress}
    for fp in frames:
        epoch = int(os.path.basename(fp).split("=")[1].split(".")[0])
        events = decode_batch(open(fp, "rb").read())
        assert events, fp
        # dispatchers sorted, one per table, epoch stamped
        tids = [e.dispatcher_id[0] for e in events]
        assert tids == sorted(set(tids))
        assert all(e.epoch == epoch for e in events)
        # the changefeed watermark is the max over dispatcher watermarks
        assert max(e.resolved_ts for e in events) == \
            by_epoch[epoch]["resolved_ts"]
