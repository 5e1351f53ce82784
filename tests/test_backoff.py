"""Changefeed error backoff (`streaming/backoff.py`, the
`coordinator/changefeed/backoff.go` twin) under a deterministic clock."""

from __future__ import annotations

from ticdc_spark.streaming.backoff import (
    BACKOFF_INIT_S,
    BACKOFF_MAX_INTERVAL_S,
    BACKOFF_MULTIPLIER,
    ChangefeedBackoff,
    is_fast_fail,
    is_unretryable,
)


class Clock:
    def __init__(self) -> None:
        self.t = 1000.0

    def __call__(self) -> float:
        return self.t


def _err(code="CDC:ErrMySQLConnectionError", msg="conn refused"):
    return {"code": code, "message": msg}


def test_fast_fail_codes():
    assert is_fast_fail("CDC:ErrStartTsBeforeGC")
    assert is_fast_fail("CDC:ErrSnapshotLostByGC")
    assert not is_fast_fail("CDC:ErrMySQLConnectionError")
    assert not is_fast_fail(None)


def test_transient_error_goes_warning_with_schedule():
    clk = Clock()
    bo = ChangefeedBackoff(clock=clk, checkpoint_ts=100)
    changed, state, err = bo.check_status(100, [_err()])
    assert (changed, state) == (True, "warning")
    assert err["code"] == "CDC:ErrMySQLConnectionError"
    # gated until the first interval elapses (10 s init)
    assert not bo.should_run()
    clk.t += BACKOFF_INIT_S + 0.1
    assert bo.should_run()
    # second failure doubles the wait
    changed, state, _ = bo.check_status(100, [_err()])
    assert state == "warning"
    clk.t += BACKOFF_INIT_S * BACKOFF_MULTIPLIER - 1
    assert not bo.should_run()
    clk.t += 2
    assert bo.should_run()


def test_checkpoint_advance_recovers_to_normal():
    clk = Clock()
    bo = ChangefeedBackoff(clock=clk, checkpoint_ts=100)
    bo.check_status(100, [_err()])
    assert bo.retrying
    changed, state, err = bo.check_status(150, [])
    assert (changed, state, err) == (True, "normal", None)
    assert not bo.retrying  # schedule reset (`backoff.go:155-167`)


def test_fast_fail_is_immediate_and_latched():
    bo = ChangefeedBackoff(clock=Clock())
    changed, state, err = bo.check_status(
        0, [_err("CDC:ErrStartTsBeforeGC", "gc")])
    assert (changed, state) == (True, "failed")
    # latched: later progress cannot resurrect it (`backoff.go:114-116`)
    changed, state, _ = bo.check_status(999, [])
    assert (changed, state) == (False, "failed")
    assert not bo.should_run()


def test_stuck_duration_exhausts_to_failed():
    clk = Clock()
    bo = ChangefeedBackoff(error_stuck_duration_s=60.0, clock=clk)
    _c, state, _e = bo.check_status(0, [_err()])
    assert state == "warning"
    clk.t += 61  # past the stuck duration
    _c, state, _e = bo.check_status(0, [_err()])
    assert state == "failed"
    assert bo.failed


def test_interval_caps_at_max():
    clk = Clock()
    bo = ChangefeedBackoff(error_stuck_duration_s=1e9, clock=clk)
    for _ in range(12):
        bo.check_status(0, [_err()])
    assert bo.next_retry_time - clk.t <= BACKOFF_MAX_INTERVAL_S


def test_unretryable_classification():
    from pyspark.errors import AnalysisException

    assert is_unretryable(ValueError("bad config"))
    assert is_unretryable(
        AnalysisException("UNRESOLVED_COLUMN no_such_column"))
    assert not is_unretryable(RuntimeError("connection reset"))


def test_registry_warning_then_resume(tmp_path, spark, sf_dir, monkeypatch):
    """A transient (non-analysis) failure lands in 'warning' with the
    error code recorded; resume clears the backoff."""
    from ticdc_spark.streaming.registry import ChangefeedRegistry

    reg = ChangefeedRegistry(str(tmp_path))
    cf = reg.create("cf-warn", "")
    # make the run raise a RuntimeError (transient class)
    monkeypatch.setattr(
        cf, "start", lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("broker connection reset")))
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        reg.run("cf-warn", spark, sf_dir, timeout_s=10)
    assert reg.list()["cf-warn"] == "warning"
    st = reg._load()["cf-warn"]
    assert st["error_code"] == "CDC:ErrAPIInvalidParam" or st["error"]
    reg.resume("cf-warn")
    assert reg.list()["cf-warn"] == "normal"
    assert "cf-warn" not in reg._backoffs
