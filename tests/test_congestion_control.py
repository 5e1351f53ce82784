"""CongestionControl wire codec + integration into the scan-window
controller (the message's consumer)."""

from __future__ import annotations

import pytest

from ticdc_spark.codec.congestion_control import (
    V1,
    V2,
    AvailableMemory,
    CongestionControl,
    unmarshal_congestion_control,
)
from ticdc_spark.codec.event_header import TYPE_CONGESTION_CONTROL


def _sample(version):
    return CongestionControl(
        cluster_id=77,
        version=version,
        availables=[
            AvailableMemory(gid=(1, 2), available=1 << 30,
                            usage_ratio=0.75,
                            dispatcher_available=[((9, 9), 123456)],
                            memory_release_count=2),
            AvailableMemory(gid=(3, 4), available=1 << 20,
                            usage_ratio=0.25),
        ],
    )


@pytest.mark.parametrize("version", [V1, V2])
def test_roundtrip(version):
    cc = _sample(version)
    back = unmarshal_congestion_control(cc.marshal())
    assert back.cluster_id == 77
    assert back.version == version
    assert [a.gid for a in back.availables] == [(1, 2), (3, 4)]
    assert back.availables[0].available == 1 << 30
    assert back.availables[0].dispatcher_available == [((9, 9), 123456)]
    if version == V2:
        assert back.availables[0].usage_ratio == 0.75
        assert back.availables[0].memory_release_count == 2
    else:  # v1 carries neither ratio nor release counts
        assert back.availables[0].usage_ratio == 0.0
        assert back.availables[0].memory_release_count == 0


def test_header_type_and_layout():
    blob = _sample(V1).marshal()
    assert blob[4:6] == TYPE_CONGESTION_CONTROL.to_bytes(2, "big")
    # payload: cluster_id u64 BE then count u32 BE
    assert blob[16:24] == (77).to_bytes(8, "big")
    assert blob[24:28] == (2).to_bytes(4, "big")
    # GID is little-endian (types.go:119-129)
    assert blob[28:36] == (1).to_bytes(8, "little")


def test_wire_reports_drive_the_controller():
    """Decode v2 reports into the (ts, ratio, release) tape and run the
    controller reference one tick: a 0.99 usage report must brake."""
    from tests.test_scan_window import _reference

    cc = CongestionControl(
        cluster_id=1, version=V2,
        availables=[AvailableMemory(gid=(5, 0), available=100,
                                    usage_ratio=0.99)],
    )
    back = unmarshal_congestion_control(cc.marshal())
    r = back.availables[0]
    # one tick at ts=0: (ts, lastr, avgr, mxr, cnt, span, rel)
    out = _reference([(0, r.usage_ratio, r.usage_ratio, r.usage_ratio,
                       1, 0, r.memory_release_count)])
    assert out["n_brake"] == 1
    assert out["final_interval_ms"] < 5000 or out["final_interval_ms"] == 5000


# -- dispatcher heartbeat / response ----------------------------------------

def test_heartbeat_v1_v2_roundtrip():
    from ticdc_spark.codec.dispatcher_heartbeat import (
        HEARTBEAT_V1,
        HEARTBEAT_V2,
        DispatcherHeartbeat,
        DispatcherProgress,
        unmarshal_heartbeat,
    )

    for version in (HEARTBEAT_V1, HEARTBEAT_V2):
        hb = DispatcherHeartbeat(
            cluster_id=5, version=version,
            progresses=[DispatcherProgress((1, 2), 1000, epoch=7),
                        DispatcherProgress((3, 4), 2000, epoch=8)])
        back = unmarshal_heartbeat(hb.marshal())
        assert back.cluster_id == 5 and back.version == version
        assert [p.dispatcher_id for p in back.progresses] == [(1, 2), (3, 4)]
        assert [p.checkpoint_ts for p in back.progresses] == [1000, 2000]
        if version == HEARTBEAT_V2:
            assert [p.epoch for p in back.progresses] == [7, 8]
        else:
            assert [p.epoch for p in back.progresses] == [0, 0]


def test_heartbeat_response_roundtrip_and_removed_state():
    from ticdc_spark.codec.dispatcher_heartbeat import (
        DS_STATE_NORMAL,
        DS_STATE_REMOVED,
        DispatcherHeartbeatResponse,
        unmarshal_heartbeat_response,
    )

    resp = DispatcherHeartbeatResponse(
        cluster_id=9,
        states=[((1, 2), DS_STATE_NORMAL), ((3, 4), DS_STATE_REMOVED)])
    back = unmarshal_heartbeat_response(resp.marshal())
    assert back.states == [((1, 2), 0), ((3, 4), 1)]
