"""A3 flow-control: hysteresis transitions and circuit-breaker victim
choice (`docs/design/2024-12-20-ticdc-flow-control.md:37-52`)."""

from __future__ import annotations

from ticdc_spark.operators.flow_control import (
    area_flow_control,
    circuit_breaker,
    path_flow_control,
)

SAMPLES = "area string, path string, bucket_ts long, usage_bytes long"


def _samples(spark, series, path="p1"):
    rows = [("a1", path, i, b) for i, b in enumerate(series)]
    return spark.createDataFrame(rows, SAMPLES)


def test_path_hysteresis_transitions(spark):
    # quota 100 → pause above 20 bytes (20%), resume below 10 (10%).
    # series: 5(run) 25(pause) 15(HOLD paused) 8(resume) 15(HOLD run) 30(pause)
    out = path_flow_control(_samples(spark, [5, 25, 15, 8, 15, 30]), 100) \
        .orderBy("bucket_ts").collect()
    assert [r.path_paused for r in out] == [0, 1, 1, 0, 0, 1]


def test_initial_state_is_running(spark):
    # mid-band first sample → no marker yet → resumed by default
    out = path_flow_control(_samples(spark, [15, 15]), 100).collect()
    assert [r.path_paused for r in out] == [0, 0]


def test_area_sums_paths(spark):
    # two paths, each 45 bytes → area 90% of quota 100 → paused;
    # path-level (20/10) both paused too, but independently.
    rows = [("a1", "p1", 0, 45), ("a1", "p2", 0, 45),
            ("a1", "p1", 1, 10), ("a1", "p2", 1, 10)]
    s = spark.createDataFrame(rows, SAMPLES)
    area = area_flow_control(s, 100).orderBy("bucket_ts").collect()
    assert [r.area_paused for r in area] == [1, 0]  # 90% pause, 20% resume...
    # (20 < 50 resume threshold → resumes)
    assert [r.usage_pct for r in area] == [90, 20]


def test_breaker_picks_longest_path(spark):
    rows = [("a1", "p1", 0, 50), ("a1", "p2", 0, 70), ("a1", "p3", 0, 30)]
    s = spark.createDataFrame(rows, SAMPLES)
    # area 150 > 100 * 95% → breach; victim = p2 (max bytes)
    out = circuit_breaker(s, 100, global_pct=95).collect()
    assert len(out) == 1
    assert (out[0].discard_path, out[0].discard_bytes) == ("p2", 70)
    # below threshold → no action
    assert circuit_breaker(s, 200, global_pct=95).count() == 0
