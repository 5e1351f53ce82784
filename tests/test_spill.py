"""Spill record file format (`pkg/spill/record_file.go`)."""

from __future__ import annotations

import struct

import pytest

from ticdc_spark.sinks.spill import Handle, RecordFile, scan_records


def test_append_read_roundtrip(tmp_path):
    rf = RecordFile(str(tmp_path / "spill"))
    h1 = rf.append(b"first record")
    h2 = rf.append_chunks(b"second ", b"record ", b"chunked")
    assert rf.read(h1) == b"first record"
    assert rf.read(h2) == b"second record chunked"
    # handles address past the length prefix
    assert h1.offset == 8 and h1.length == 12
    assert h2.offset == 8 + 12 + 8


def test_wire_layout_is_len_prefixed_le(tmp_path):
    rf = RecordFile(str(tmp_path / "spill"))
    rf.append(b"abc")
    rf.close()
    raw = open(rf.path, "rb").read()
    assert raw == struct.pack("<Q", 3) + b"abc"  # record_file.go layout
    assert scan_records(rf.path) == [b"abc"]


def test_scan_reads_reference_layout(tmp_path):
    # hand-built file in the Go layout (a reference-written artifact)
    p = tmp_path / "ref_spill"
    with open(p, "wb") as f:
        for payload in (b"r1", b"longer record 2", b"z" * 300):
            f.write(struct.pack("<Q", len(payload)) + payload)
    assert scan_records(str(p)) == [b"r1", b"longer record 2", b"z" * 300]


def test_error_paths(tmp_path):
    rf = RecordFile(str(tmp_path / "spill"))
    with pytest.raises(ValueError):
        rf.append(b"")
    h = rf.append(b"data")
    with pytest.raises(ValueError):
        rf.read(Handle(offset=h.offset, length=0))  # invalid handle
    with pytest.raises(ValueError):
        rf.read(Handle(offset=h.offset, length=99))  # corrupt length
    rf.cleanup()
    with pytest.raises(ValueError):
        rf.append(b"after cleanup")
    with pytest.raises(ValueError):
        RecordFile("")
