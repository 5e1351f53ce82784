"""Changefeed error backoff / state machine —
`coordinator/changefeed/backoff.go:34-250` + the GC fast-fail set
(`pkg/errors/helper.go:67-84`).

Error semantics:

- **fast-fail** (data already/soon GC'd upstream: ErrGCTTLExceeded,
  ErrSnapshotLostByGC, ErrStartTsBeforeGC) → ``failed`` immediately;
  retrying cannot help, the data is gone.
- any other error with no checkpoint progress → ``warning`` + an
  exponential retry schedule (10 s initial, ×2, 10 m cap); once errors
  persist past ``changefeed-error-stuck-duration`` (default 30 m,
  `replica_config.go:123`) → ``failed``.
- checkpoint advancing while retrying → recovered, back to ``normal``
  and the schedule resets.

The reference adds ±10% randomization to retry intervals; this twin is
deterministic (injectable clock) so the schedule is testable — the
state transitions are identical.
"""
from __future__ import annotations

import time

FAST_FAIL_CODES = frozenset({
    "CDC:ErrGCTTLExceeded",
    "CDC:ErrSnapshotLostByGC",
    "CDC:ErrStartTsBeforeGC",
})

BACKOFF_INIT_S = 10.0          # defaultBackoffInitInterval
BACKOFF_MAX_INTERVAL_S = 600.0  # defaultBackoffMaxInterval
BACKOFF_MULTIPLIER = 2.0        # defaultBackoffMultiplier
ERROR_STUCK_DURATION_S = 30 * 60.0  # ChangefeedErrorStuckDuration


def is_fast_fail(code: str | None) -> bool:
    return code in FAST_FAIL_CODES


class ChangefeedBackoff:
    def __init__(self, error_stuck_duration_s: float = ERROR_STUCK_DURATION_S,
                 checkpoint_ts: int = 0, clock=time.monotonic) -> None:
        self.max_elapsed_s = error_stuck_duration_s
        self.checkpoint_ts = checkpoint_ts
        self.clock = clock
        self.failed = False
        self.retrying = False
        self.is_restarting = False
        self.next_retry_time = 0.0
        self._reset_err_retry()

    # -- schedule -------------------------------------------------------
    def _reset_err_retry(self) -> None:
        self._interval = BACKOFF_INIT_S
        self._start = self.clock()
        self.next_retry_time = 0.0
        self.failed = False
        self.retrying = False

    def _next_backoff(self) -> float | None:
        """Current interval, then grow; None once the schedule's elapsed
        time passes the stuck duration (the backoff Stop sentinel)."""
        if self.clock() - self._start > self.max_elapsed_s:
            return None
        iv = min(self._interval, BACKOFF_MAX_INTERVAL_S)
        self._interval = min(self._interval * BACKOFF_MULTIPLIER,
                             BACKOFF_MAX_INTERVAL_S)
        return iv

    def should_run(self) -> bool:
        """Scheduling gate (`ShouldRun`): not failed and past the next
        retry time."""
        return not self.failed and self.clock() >= self.next_retry_time

    def start_finished(self) -> None:
        self.is_restarting = False

    # -- the transition function ---------------------------------------
    def check_status(self, checkpoint_ts: int,
                     errors: list[dict] | None
                     ) -> tuple[bool, str, dict | None]:
        """(changed, state, error) per `CheckStatus` (`backoff.go:149`):
        failed latch → failed; fast-fail code → failed; checkpoint
        advance → normal (recovering a retry); errors without progress
        → warning until the schedule exhausts → failed."""
        errors = errors or []
        if self.failed:
            return False, "failed", None
        fast = next((e for e in errors
                     if is_fast_fail(e.get("code"))), None)
        if fast is not None:
            if checkpoint_ts > self.checkpoint_ts:
                self.checkpoint_ts = checkpoint_ts
            self.failed = True
            return True, "failed", fast
        if checkpoint_ts > self.checkpoint_ts:
            self.checkpoint_ts = checkpoint_ts
            if self.retrying:
                self._reset_err_retry()
                return True, "normal", None
            return False, "normal", None
        if errors:
            last = errors[-1]
            if not self.retrying:
                self._reset_err_retry()
                self.retrying = True
            self.is_restarting = True
            iv = self._next_backoff()
            if iv is None:
                self.failed = True
                return True, "failed", last
            self.next_retry_time = self.clock() + iv
            return True, "warning", last
        return False, "normal", None


def is_unretryable(exc: BaseException) -> bool:
    """Errors a retry cannot fix — config/analysis mistakes (bad
    expression, unknown column, invalid option).  The reference's
    ShouldFailChangefeed covers the same class by error code; here the
    exception type carries it: planning/validation failures are
    deterministic, so re-running reproduces them forever."""
    try:
        from pyspark.errors import AnalysisException
    except Exception:  # pragma: no cover
        AnalysisException = ()
    return isinstance(exc, (ValueError, TypeError, AnalysisException))
