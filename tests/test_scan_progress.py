"""O3 scan-limit / resume-cursor invariants (scanProgress semantics).

Mirrors the contract in `pkg/eventservice/scan_progress.go:21-33`: a
chunked scan must lose nothing, duplicate nothing, and a row-level
cursor must resume INSIDE the pending transaction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ticdc_spark.operators.scan_progress import (
    chunk_scan_atomic,
    chunk_scan_split,
    resume_after,
    scan_cursors,
)
from ticdc_spark.sources.changelog import events_changelog


def test_split_chunks_partition_the_scan(spark, sf_dir):
    cl = events_changelog(spark, sf_dir)
    chunked = chunk_scan_split(cl, 200).cache()
    total = cl.count()
    assert chunked.count() == total
    assert chunked.select("seq").distinct().count() == total
    sizes = chunked.groupBy("table_id", "chunk").count().collect()
    for r in sizes:
        assert r["count"] <= 200


def test_atomic_chunks_never_split_txns(spark, sf_dir):
    from ticdc_spark.sources.typed import lineitem_changelog

    cl = lineitem_changelog(spark, sf_dir)
    chunked = chunk_scan_atomic(cl, 500).cache()
    spans = (
        chunked.groupBy("table_id", "commit_ts", "start_ts")
        .agg(F.countDistinct("chunk").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert spans.count() == 0
    assert chunked.count() == cl.count()


def test_row_cursor_resumes_inside_txn(spark, sf_dir):
    cl = events_changelog(spark, sf_dir).cache()
    chunked = chunk_scan_split(cl, 137).cache()  # prime → mid-txn tails
    cursors = scan_cursors(chunked).collect()
    by_key = {(r["table_id"], r["chunk"]): r for r in cursors}
    # every non-final chunk's cursor must reproduce exactly the rows of
    # all later chunks for that table
    max_chunk = {}
    for tid, chunk in by_key:
        max_chunk[tid] = max(max_chunk.get(tid, -1), chunk)
    checked_rows = checked_boundary = 0
    for (tid, chunk), cur in by_key.items():
        if chunk == max_chunk[tid] or chunk > 2:
            continue
        expected = {
            r["seq"]
            for r in chunked.filter(
                (F.col("table_id") == tid) & (F.col("chunk") > chunk)
            ).select("seq").collect()
        }
        got = {
            r["seq"]
            for r in resume_after(
                cl, tid, cur["cursor_commit_ts"], cur["cursor_start_ts"],
                cur["cursor_pos"], cur["cursor_dml_order"],
            ).select("seq").collect()
        }
        assert got == expected, (tid, chunk, cur["form"])
        if cur["form"] == "row":
            checked_rows += 1
        else:
            checked_boundary += 1
    assert checked_rows + checked_boundary > 0
    # final chunks resolve the boundary: start_ts collapses to 0
    for (tid, chunk), cur in by_key.items():
        if chunk == max_chunk[tid]:
            assert cur["form"] == "boundary"
            assert cur["cursor_start_ts"] == 0
            assert cur["cursor_pos"] is None
