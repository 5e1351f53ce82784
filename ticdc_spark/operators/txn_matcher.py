"""J2 — prewrite ↔ commit transaction matching.

Reference: `logservice/logpuller/txn_matcher.go:45-163` — Percolator
prewrite rows (carrying the payload, keyed by (startTs, key)) are
matched with commit records (carrying the commitTs) to form committed
rows; unmatched prewrites are cached, rollbacks discard them.

Spark-first: an equi-join on (start_ts, key). In streaming this is a
stream-stream join with watermark-bounded state (the matcher's cache);
in batch it is a plain inner join (rollback = anti-join). The committed
output is exactly the changelog shape the rest of the engine consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_prewrite_commit(cl: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Decompose a committed changelog into the reference's two raw
    streams (for testing the matcher round-trips)."""
    prewrites = cl.select(
        "schema_name", "table_name", "table_id", "op", "start_ts", "seq",
        "dml_order", "pk", "before", "after",
    )
    commits = cl.select("start_ts", "pk", "commit_ts")
    return prewrites, commits


def match_transactions(prewrites: DataFrame, commits: DataFrame) -> DataFrame:
    """Committed rows = prewrite ⋈ commit on (start_ts, key). Prewrites
    without a commit record (pending/rolled back) drop out, mirroring
    txn_matcher.go's matchRow."""
    return prewrites.join(commits, ["start_ts", "pk"], "inner")


def unmatched_prewrites(prewrites: DataFrame, commits: DataFrame) -> DataFrame:
    """The matcher's cache content: prewrites still awaiting a commit."""
    return prewrites.join(commits, ["start_ts", "pk"], "left_anti")
