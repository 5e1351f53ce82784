"""Custom stateful streaming operators (SURVEY §2.12).

Two reference stateful behaviors rebuilt on
``applyInPandasWithState`` (Arrow-batched, per-key state store,
timeout-driven eviction):

- **streaming txn matcher** (J2, `logservice/logpuller/txn_matcher.go`):
  prewrite rows wait in state until their commit record arrives; state
  times out (rollback analog) if no commit shows up within the horizon.
- **large-txn accumulation** (O3, `pkg/eventservice/large_txn_spill.go`):
  rows of one (start_ts) transaction accumulate in state and flush as
  one atomic group when the txn's resolved marker arrives.

The functions are nested so cloudpickle ships them by value (driver cwd
independence — see llm/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MATCHED_SCHEMA = (
    "start_ts long, pk long, op string, seq long, commit_ts long"
)
STATE_SCHEMA = "ops array<string>, seqs array<long>, commit_ts long"


def streaming_txn_match(events: DataFrame, timeout_ms: int = 60_000) -> DataFrame:
    """events: unioned stream of prewrite rows (kind='P', commit_ts null)
    and commit records (kind='C', commit_ts set), keyed by (start_ts, pk).

    Emits matched committed rows; prewrites lacking a commit are dropped
    when their state times out (the matcher's rollback GC)."""

    def match(key, pdfs, state):
        import pandas as pd

        (start_ts, pk) = key
        ops, seqs, commit_ts = ([], [], None)
        if state.exists:
            ops, seqs, commit_ts = state.get
            ops, seqs = list(ops), list(seqs)
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=[
                "start_ts", "pk", "op", "seq", "commit_ts"])
            return
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                if row["kind"] == "C":
                    commit_ts = int(row["commit_ts"])
                else:
                    ops.append(row["op"])
                    seqs.append(int(row["seq"]))
        if commit_ts is not None and ops:
            state.remove()
            yield pd.DataFrame({
                "start_ts": start_ts, "pk": pk, "op": ops, "seq": seqs,
                "commit_ts": commit_ts,
            })
        else:
            state.update((ops, seqs, commit_ts))
            state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame(columns=[
                "start_ts", "pk", "op", "seq", "commit_ts"])

    return events.groupBy("start_ts", "pk").applyInPandasWithState(
        match, MATCHED_SCHEMA, STATE_SCHEMA, "append", "ProcessingTimeTimeout"
    )
