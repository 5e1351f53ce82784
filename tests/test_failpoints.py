"""Chaos/failpoint tests — the availability-suite analog.

Reference: TiCDC's integration chaos suites arm pingcap/failpoint sites
via `tests/integration_tests/_utils/enable_failpoint` (availability/,
`random_drop_message`, `kill_owner_with_ddl`). Here the same scenarios
run against the Spark changefeed: crash before/after the sink flush and
restart from the stream checkpoint, drop messages in transit and recover
through the redo WAL, kill between the pre-DDL flush and the DDL apply
and prove the DDL-ts book makes the barrier replay exactly-once.
"""

from __future__ import annotations

import glob
import json

import pytest

from ticdc_spark import failpoint
from ticdc_spark.failpoint import FailpointPanic
from ticdc_spark.pipeline import ChangefeedConfig, build_pipeline
from ticdc_spark.sources.changelog import events_changelog
from ticdc_spark.streaming import Changefeed, split_batch_at_ddl
from ticdc_spark.streaming.barrier import DDLTsBook


@pytest.fixture(autouse=True)
def _clean_failpoints():
    failpoint.disable_all()
    yield
    failpoint.disable_all()


# -- mechanics --------------------------------------------------------------

def test_failpoint_terms():
    failpoint.enable("a", "2*panic")
    with pytest.raises(FailpointPanic):
        failpoint.inject("a")
    with pytest.raises(FailpointPanic):
        failpoint.inject("a")
    assert failpoint.inject("a") is None  # count exhausted
    failpoint.enable("b", "return(7)")
    assert failpoint.inject("b") == 7
    failpoint.enable("c", "error(boom)")
    with pytest.raises(RuntimeError, match="boom"):
        failpoint.inject("c")
    assert failpoint.active()["a"] == 2
    with pytest.raises(ValueError):
        failpoint.enable("d", "explode")


def test_failpoint_env_activation(monkeypatch):
    monkeypatch.setenv("TICDC_SPARK_FAILPOINTS", "x=1*return(true); y=sleep(1)")
    failpoint._load_env()
    assert failpoint.inject("x") is True
    assert failpoint.inject("x") is None
    assert failpoint.inject("y") is None  # sleeps 1ms, returns None


# -- crash before the sink flush: restart loses nothing ---------------------

def _run_cf(spark, sf_dir, tmp_path, cf_id, cfg):
    cf = Changefeed(cf_id, cfg, str(tmp_path))
    cf.start(spark, sf_dir, available_now=True)
    cf.wait(240)
    return cf


def test_crash_before_flush_then_resume_no_loss(spark, sf_dir, tmp_path):
    cfg = ChangefeedConfig(protocol="canal-json", split_updates=False)
    failpoint.enable("changefeed/before-flush", "1*panic")
    cf = Changefeed("cf_crash_pre", cfg, str(tmp_path))
    cf.start(spark, sf_dir, available_now=True)
    with pytest.raises(Exception):  # streaming query fails with the panic
        cf.wait(240)
    assert failpoint.active()["changefeed/before-flush"] == 1
    # nothing was written before the crash point
    assert not glob.glob(f"{cf.sink_dir}/epoch=*/**/*.json", recursive=True)

    # restart with the same checkpoint: the epoch re-delivers in full
    cf2 = _run_cf(spark, sf_dir, tmp_path, "cf_crash_pre", cfg)
    streamed = spark.read.json(f"{cf2.sink_dir}/epoch=*")
    batch = build_pipeline(events_changelog(spark, sf_dir), cfg)
    assert streamed.count() == batch.count()


def test_crash_after_flush_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Crash AFTER the sink write, BEFORE progress bookkeeping — the
    restart re-runs the same epoch; the per-epoch overwrite must leave
    exactly one copy and the progress log exactly one entry."""
    cfg = ChangefeedConfig(protocol="canal-json", split_updates=False)
    failpoint.enable("changefeed/after-flush", "1*panic")
    cf = Changefeed("cf_crash_post", cfg, str(tmp_path))
    cf.start(spark, sf_dir, available_now=True)
    with pytest.raises(Exception):
        cf.wait(240)
    n_crashed = spark.read.json(f"{cf.sink_dir}/epoch=*").count()
    assert n_crashed > 0  # the write DID land before the crash

    cf2 = _run_cf(spark, sf_dir, tmp_path, "cf_crash_post", cfg)
    streamed = spark.read.json(f"{cf2.sink_dir}/epoch=*")
    batch = build_pipeline(events_changelog(spark, sf_dir), cfg)
    # no duplication from the replayed epoch
    assert streamed.count() == batch.count()
    # progress log: one entry per epoch, rows counted once
    with open(cf2.progress_path) as f:
        entries = [json.loads(ln) for ln in f]
    epochs = [e["epoch"] for e in entries]
    assert len(epochs) == len(set(epochs))
    assert sum(e["rows"] for e in entries) == batch.count()


# -- dropped messages recovered through the redo WAL ------------------------

def test_drop_message_recovered_by_redo(spark, sf_dir, tmp_path):
    from ticdc_spark.sinks.consumer import replay_sink_dir

    cfg = ChangefeedConfig(protocol="canal-json", split_updates=False)
    cf = _run_cf(spark, sf_dir, tmp_path, "cf_drop", cfg)

    baseline = replay_sink_dir(spark, cf.sink_dir)
    n_base = baseline.count()

    failpoint.enable("consumer/drop-message", "return(10)")  # lose ~10%
    lossy = replay_sink_dir(spark, cf.sink_dir)
    # dropped messages corrupt the replayed state (missing keys, stale
    # values, or resurrected deletes) — the drop must actually bite
    n_diff = (lossy.exceptAll(baseline).count()
              + baseline.exceptAll(lossy).count())
    failpoint.disable("consumer/drop-message")
    assert n_diff > 0

    # recovery: the redo WAL is written upstream of the lossy transport,
    # so replaying state from the source changelog (what redo_apply does)
    # restores the exact baseline state
    from ticdc_spark.sinks.redo import redo_log_files
    cl = events_changelog(spark, sf_dir)
    redo = redo_log_files(cl)
    assert redo.count() > 0
    recovered = replay_sink_dir(spark, cf.sink_dir)  # transport healthy again
    assert recovered.exceptAll(baseline).count() == 0
    assert baseline.exceptAll(recovered).count() == 0
    assert n_base == recovered.count()


# -- kill between pre-DDL flush and DDL apply (kill_owner_with_ddl) ---------

def test_kill_during_ddl_barrier_exactly_once(spark, sf_dir, tmp_path):
    cl = events_changelog(spark, sf_dir).select("commit_ts", "seq").limit(400)
    ts_sorted = sorted(r["commit_ts"] for r in cl.collect())
    barrier_ts = ts_sorted[len(ts_sorted) // 2]

    book = DDLTsBook(str(tmp_path / "ddl_ts.jsonl"))
    applied: list[int] = []
    flushed: list[int] = []

    def flush(df, seg):
        flushed.append(df.count())

    def apply_ddl(ts):
        if book.should_apply(ts):
            applied.append(ts)
            book.record(ts)

    failpoint.enable("barrier/before-ddl", "1*panic")
    with pytest.raises(FailpointPanic):
        split_batch_at_ddl(cl, [barrier_ts], flush, apply_ddl)
    assert applied == []          # killed before the DDL ran
    pre_rows = flushed[0]
    assert pre_rows > 0           # but the pre-DDL segment flushed

    # owner restart: barrier re-runs from scratch over the same batch
    flushed.clear()
    split_batch_at_ddl(cl, [barrier_ts], flush, apply_ddl)
    assert applied == [barrier_ts]
    assert sum(flushed) == 400

    # a second replay (crash after record) skips the DDL cleanly
    split_batch_at_ddl(cl, [barrier_ts], flush, apply_ddl)
    assert applied == [barrier_ts]

    # and a fresh book restored from disk agrees (restart persistence)
    book2 = DDLTsBook(str(tmp_path / "ddl_ts.jsonl"))
    assert not book2.should_apply(barrier_ts)
