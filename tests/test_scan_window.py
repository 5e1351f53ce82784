"""Adaptive scan-window controller: Spark fold vs a plain-Python
reference of the Go semantics (`pkg/eventservice/scan_window.go`).

The oracle-parity test proves Spark == DuckDB; this one proves both
match an independently-written sequential implementation, so a shared
translation mistake in the SQL transition cannot pass silently.
"""

from __future__ import annotations

from ticdc_spark.operators import scan_window as sw
from ticdc_spark.sources.changelog import events_changelog


def _reference(rows):
    """rows: [(ts, lastr, avgr, mxr, cnt, span, rel)] time-ordered."""
    fast = slow = 0.0
    init = False
    p = 0.0
    la = ld = -1
    lc = li = sw._NEG_INF_TS
    cur = sw.DEFAULT_IV_MS
    counts = dict(nb=0, nh=0, nsu=0, nvl=0, nlr=0, nn=0)

    for ts, lastr, avgr, mxr, cnt, span, rel in rows:
        if not init:
            fast = slow = lastr
            init = True
        else:
            fast = fast + 0.4 * (lastr - fast)
            slow = slow + 0.2 * (lastr - slow)

        braked = (ts - lc) >= sw.BRAKE_COOLDOWN_S and lastr > 0.9
        if braked:
            if lastr > 0.98:
                allow_min = (cur <= sw.DEFAULT_IV_MS and cnt >= 3
                             and fast >= 0.9)
                if cur <= sw.DEFAULT_IV_MS and allow_min:
                    cur = max(cur // 2, sw.MIN_IV_MS)
                elif cur <= 6 * sw.DEFAULT_IV_MS:
                    cur = min(max(cur // 2, sw.DEFAULT_IV_MS), cur)
                else:
                    cur = max(cur // 4, sw.PLATEAU_IV_MS)
            else:
                cur = min(max(cur // 2, sw.DEFAULT_IV_MS), cur)
            lc = la = ld = li = ts
            counts["nb"] += 1
            continue

        # pressure score update + relief
        if fast >= 0.75 or slow >= 0.75 or lastr >= 0.7:
            p = min(p + 2, 8.0)
        elif fast >= 0.55 or slow >= 0.55 or avgr >= 0.55:
            p = min(p + 1, 8.0)
        elif fast < 0.30 and slow < 0.25 and lastr < 0.30:
            p = max(0.0, p - 1.5)
        else:
            p = max(0.0, p - 0.5)
        if rel > 0:
            p = max(0.0, p - min(rel * 2.0, 8.0))

        hot = fast >= 0.75 or slow >= 0.75 or lastr >= 0.7
        warm = fast >= 0.55 or slow >= 0.55 or avgr >= 0.55
        if (ts - ld) >= sw.PRESSURE_COOLDOWN_S and hot:
            cur = min(max(cur * 3 // 4, sw.DEFAULT_IV_MS), cur)
            la = ld = li = ts
            counts["nh"] += 1
            continue
        if (ts - ld) >= sw.PRESSURE_COOLDOWN_S and p >= 3.0 and warm:
            cur = min(max(cur * 9 // 10, sw.DEFAULT_IV_MS), cur)
            la = ld = li = ts
            counts["nsu"] += 1
            continue
        if (cur <= sw.DEFAULT_IV_MS and (ts - la) >= sw.FLOOR_RECOVERY_S
                and (ts - ld) >= sw.FLOOR_RECOVERY_S and cnt >= 3
                and lastr < 0.35 and avgr < 0.55 and fast < 0.45
                and slow < 0.40 and p < 1.5):
            nxt = min(cur * 5 // 4, sw.MAX_IV_MS)
            if nxt > cur:
                cur, la = nxt, ts
                counts["nlr"] += 1
                continue
        if not ((ts - la) >= sw.ADJUST_COOLDOWN_S
                and (ts - ld) >= sw.RELEASE_RECOVERY_S
                and cnt >= sw.MIN_INCREASE_SAMPLES
                and span >= sw.MIN_INCREASE_SPAN_S and p < 1.0):
            counts["nn"] += 1
            continue
        if (mxr < 0.1 and avgr < 0.1 and fast < 0.1 and slow < 0.1
                and (ts - li) >= sw.VERY_LOW_RECOVERY_S):
            scale = ((11, 10) if cur >= 120000 else
                     (6, 5) if cur >= 60000 else (3, 2))
            nxt = min(cur * scale[0] // scale[1], sw.MAX_IV_MS)
            if nxt > cur:
                cur, la = nxt, ts
                counts["nvl"] += 1
                continue
        if cur < sw.MAX_IV_MS and mxr < 0.2 and avgr < 0.2 \
                and fast < 0.23 and slow < 0.22:
            scale = ((21, 20) if cur >= 120000 else
                     (11, 10) if cur >= 60000 else (5, 4))
            nxt = min(cur * scale[0] // scale[1], sw.MAX_IV_MS)
            if nxt > cur:
                cur, la = nxt, ts
                counts["nlr"] += 1
                continue
        counts["nn"] += 1

    return dict(final_interval_ms=cur, fast_ema=fast, slow_ema=slow,
                pressure_score=p, n_brake=counts["nb"],
                n_high_pressure=counts["nh"], n_sustained=counts["nsu"],
                n_very_low_recovery=counts["nvl"],
                n_low_recovery=counts["nlr"], n_none=counts["nn"])


def test_fold_matches_python_reference(spark, sf_dir):
    cl = events_changelog(spark, sf_dir)
    stats = sw.congestion_tape(cl)
    tape = stats.orderBy("table_name", "ts").collect()
    per_table: dict[str, list] = {}
    for r in tape:
        per_table.setdefault(r.table_name, []).append(
            (r.ts, r.lastr, r.avgr, r.mxr, r.cnt, r.span, r.rel))
    got = {r["table_name"]: r.asDict()
           for r in sw.fold_controller(stats).collect()}
    assert set(got) == set(per_table)
    for t, rows in per_table.items():
        want = _reference(rows)
        have = {k: v for k, v in got[t].items() if k != "table_name"}
        assert have == want, f"{t}: {have} != {want}"


def test_every_branch_fires(spark, sf_dir):
    """The synthetic profile must exercise brake, reduce, and recovery
    branches — otherwise the parity is vacuous on those paths."""
    cl = events_changelog(spark, sf_dir)
    total = (sw.fold_controller(sw.congestion_tape(cl))
             .groupBy().sum("n_brake", "n_high_pressure", "n_sustained",
                            "n_low_recovery").collect()[0])
    assert all(v > 0 for v in total), total


def test_pandas_fold_equals_sql_fold(spark, sf_dir):
    """The Arrow-batched controller (the registered query) and the pure
    SQL-algebra fold execute the same float ops — results identical."""
    cl = events_changelog(spark, sf_dir)
    stats = sw.congestion_tape(cl)
    a = {r["table_name"]: r.asDict()
         for r in sw.fold_controller(stats).collect()}
    b = {r["table_name"]: r.asDict()
         for r in sw.fold_controller_pandas(stats).collect()}
    assert a == b
