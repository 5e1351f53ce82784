"""Storage-sink file-index protocol (`sinks/file_index.py`,
`pkg/cloudstorage/generator.go` twin): numbering, restart seeding from
the index file, stale-index recovery probes, date rollover, the
across-nodes naming variant, and name parsing."""

from __future__ import annotations

import os

import pytest

from ticdc_spark.sinks.file_index import (
    FilePathGenerator,
    InvalidFileName,
    data_file_name,
    index_file_name,
    parse_file_index,
)


def _touch(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    open(path, "w").close()


def test_names_and_parse():
    assert data_file_name(1, ".csv", 20) == "CDC" + "0" * 19 + "1.csv"
    assert data_file_name(7, ".json", 6) == "CDC000007.json"
    assert data_file_name(3, ".csv", 6, "d1", True) == "CDC_d1_000003.csv"
    assert index_file_name() == "meta/CDC.index"
    assert index_file_name("d1", True) == "meta/CDC_d1.index"
    assert parse_file_index("CDC000012.csv", ".csv") == 12
    assert parse_file_index("CDC_d1_000012.csv", ".csv") == 12
    for bad in ("DATA000001.csv", "CDC000001.json", "CDCxyz.csv"):
        with pytest.raises(InvalidFileName):
            parse_file_index(bad, ".csv")


def test_fresh_directory_starts_at_one(tmp_path):
    g = FilePathGenerator(".csv", file_index_width=6)
    d = str(tmp_path / "t" / "v1" / "2026-08-14")
    p = g.generate_data_file_path(d, "2026-08-14")
    assert os.path.basename(p) == "CDC000001.csv"
    _touch(p)
    g.record_flush(d, p)
    p2 = g.generate_data_file_path(d, "2026-08-14")
    assert os.path.basename(p2) == "CDC000002.csv"


def test_restart_seeds_from_index_file(tmp_path):
    d = str(tmp_path / "t" / "v1" / "2026-08-14")
    g1 = FilePathGenerator(".csv", 6)
    for _ in range(3):
        p = g1.generate_data_file_path(d, "2026-08-14")
        _touch(p)
        g1.record_flush(d, p)
    # new generator (sink restart): index file says CDC000003
    g2 = FilePathGenerator(".csv", 6)
    assert g2.consumer_tail(d) == 3
    p = g2.generate_data_file_path(d, "2026-08-14")
    assert os.path.basename(p) == "CDC000004.csv"


def test_stale_index_recovery_probes(tmp_path):
    """Index file lags (says 1) but files 2 and 3 exist — the generator
    reloads the index once, then probes consecutively to the first
    free slot (`generator.go:377-410`)."""
    d = str(tmp_path / "t" / "v1" / "2026-08-14")
    g0 = FilePathGenerator(".csv", 6)
    p1 = g0.generate_data_file_path(d, "2026-08-14")
    _touch(p1)
    g0.record_flush(d, p1)  # index records 1
    for i in (2, 3):        # files written by a previous owner
        _touch(os.path.join(d, f"CDC{i:06d}.csv"))
    g = FilePathGenerator(".csv", 6)
    p = g.generate_data_file_path(d, "2026-08-14")
    assert os.path.basename(p) == "CDC000004.csv"


def test_date_rollover_resets(tmp_path):
    g = FilePathGenerator(".csv", 6)
    d1 = str(tmp_path / "t" / "v1" / "2026-08-14")
    p = g.generate_data_file_path(d1, "2026-08-14")
    _touch(p)
    # same generator, next day: counter restarts at 1 in the new dir
    d2 = str(tmp_path / "t" / "v1" / "2026-08-15")
    p2 = g.generate_data_file_path(d2, "2026-08-15")
    assert os.path.basename(p2) == "CDC000001.csv"


def test_across_nodes_variant(tmp_path):
    g = FilePathGenerator(".json", 6, enable_table_across_nodes=True)
    d = str(tmp_path / "t" / "v1" / "2026-08-14")
    p = g.generate_data_file_path(d, "2026-08-14", dispatcher_id="d9")
    assert os.path.basename(p) == "CDC_d9_000001.json"
    _touch(p)
    g.record_flush(d, p, dispatcher_id="d9")
    assert os.path.exists(os.path.join(d, "meta/CDC_d9.index"))
    assert g.consumer_tail(d, "d9") == 1


def test_width_clamped_like_reference():
    assert FilePathGenerator(".csv", 3).width == 6
    assert FilePathGenerator(".csv", 25).width == 20
