"""Failpoint injection — the chaos-testing hook surface.

Reference: TiCDC instruments its binaries with pingcap/failpoint sites
activated via the `GO_FAILPOINTS` env var
(`tests/integration_tests/_utils/enable_failpoint`), powering the
availability / `random_drop_message` / `kill_owner_with_ddl` e2e suites.

This is the same mechanism re-expressed for a Python+Spark engine:
named sites call :func:`inject`, tests (or the
``TICDC_SPARK_FAILPOINTS`` env var) arm them with a *term*:

    term     := [count "*"] action
    action   := "panic" | "error(msg)" | "return(json)" | "sleep(ms)"
    env form := name=term[;name=term...]

``count*`` limits how many times the site fires before disarming
(mirroring failpoint's `1*return(true)` terms); an unarmed site costs a
dict lookup. Driver-side only by design: every instrumented site runs
on the driver (foreachBatch bodies, sink flush loops), so arming a
failpoint needs no executor coordination.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
from dataclasses import dataclass


class FailpointPanic(RuntimeError):
    """Raised by the ``panic`` action — simulates a process kill at the
    site (the stack unwinds through foreachBatch, failing the streaming
    query exactly like an executor/driver crash would)."""


@dataclass
class _Armed:
    action: str
    arg: str | None
    remaining: int | None  # None = unlimited
    fired: int = 0


_TERM_RE = re.compile(
    r"^(?:(\d+)\*)?(panic|error|return|sleep)(?:\((.*)\))?$")

_registry: dict[str, _Armed] = {}
_lock = threading.Lock()


def _parse_term(term: str) -> _Armed:
    m = _TERM_RE.match(term.strip())
    if not m:
        raise ValueError(f"bad failpoint term: {term!r}")
    count, action, arg = m.groups()
    if action in ("error", "return", "sleep") and arg is None:
        raise ValueError(f"action {action} needs an argument: {term!r}")
    return _Armed(action, arg, int(count) if count else None)


def enable(name: str, term: str) -> None:
    with _lock:
        _registry[name] = _parse_term(term)


def disable(name: str) -> None:
    with _lock:
        _registry.pop(name, None)


def disable_all() -> None:
    with _lock:
        _registry.clear()


def active() -> dict[str, int]:
    """name -> times fired, for assertion in tests."""
    with _lock:
        return {k: v.fired for k, v in _registry.items()}


def inject(name: str, ctx: dict | None = None):
    """Instrumented-site call. Returns None when unarmed or for
    panic/error/sleep; returns the parsed JSON payload for ``return``."""
    with _lock:
        armed = _registry.get(name)
        if armed is None:
            return None
        if armed.remaining is not None:
            if armed.remaining <= 0:
                return None
            armed.remaining -= 1
        armed.fired += 1
        action, arg = armed.action, armed.arg
    if action == "panic":
        raise FailpointPanic(f"failpoint {name} panic (ctx={ctx})")
    if action == "error":
        raise RuntimeError(f"failpoint {name}: {arg}")
    if action == "sleep":
        time.sleep(float(arg) / 1000.0)
        return None
    if action == "return":
        return json.loads(arg)
    return None


def _load_env() -> None:
    """`TICDC_SPARK_FAILPOINTS=a=1*panic;b=return(true)` — the
    enable_failpoint analog."""
    spec = os.environ.get("TICDC_SPARK_FAILPOINTS", "")
    for part in filter(None, (p.strip() for p in spec.split(";"))):
        name, _, term = part.partition("=")
        if not term:
            raise ValueError(f"bad TICDC_SPARK_FAILPOINTS entry: {part!r}")
        enable(name.strip(), term)


_load_env()
