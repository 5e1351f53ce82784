"""S4 — DDL job fetcher: tail `tidb_ddl_job` changes and parse jobs.

Reference: `logservice/schemastore/ddl_job_fetcher.go` subscribes to the
RawKV changelog of TiDB's `tidb_ddl_job` system table
(table id `metadef.TiDBDDLJobTableID`, the top of the int48 reserved
range) and unmarshals each row's ``job_meta`` blob into a `model.Job`
(`pkg/common/event/mounter.go:175-231` ParseDDLJob):

- the record key decodes to (table_id, handle); entries whose table id
  is not the job table are rejected (`mounter.go:194-205`);
- the binary row decodes with the TiDB row codec; ``job_meta`` holds
  the JSON-serialized job (`:199-200`);
- only jobs already in the Done/Synced state replay into the schema
  store (`parseJob` `:220-222` — running/cancelled jobs are dropped);
- the job's ``StartTS`` is overwritten with the entry's start ts and
  ``BinlogInfo.FinishedTS`` with the entry's commit ts (`:226-229`).

Spark shape: the binary decode is Arrow-batched ``mapInPandas`` (same
sanctioned slow path as the S7 mounter — no Catalyst expression unpacks
TiDB varint rows), and everything after the blob extraction is JVM-side:
``from_json`` parses the job document, the Done-state gate and the
projection are plain column expressions. The job stream is tiny
(control-plane), but the decode still distributes: at 100 TB the same
plan handles a busy DDL workload with zero driver involvement.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from ticdc_spark.codec.rowcodec import (
    decode_record_key,
    decode_row_v1,
    decode_row_v2,
    encode_record_key,
    encode_row_v2,
    encode_value,
    is_new_format,
)

# TiDB reserves the top of the int48 id range for system tables
# (tidb `pkg/meta/metadef`): MaxInt48 = 0x0000FFFFFFFFFFFF and
# `tidb_ddl_job` sits one below it.
MAX_INT48 = 0x0000_FFFF_FFFF_FFFF
JOB_TABLE_ID = MAX_INT48 - 1

# tidb_ddl_job column ids: the fetcher resolves `job_meta`'s column id
# at init (`ddl_job_fetcher.go:207-214`); our synthetic job table uses
# the same 3-column shape (job_id, job_meta, processing).
_JOB_ID_COL, _JOB_META_COL, _PROCESSING_COL = 1, 2, 3

# model.JobState (tidb `pkg/meta/model/job.go`): IsDone == Done|Synced
JOB_STATE_RUNNING = 1
JOB_STATE_ROLLBACK_DONE = 3
JOB_STATE_DONE = 4
JOB_STATE_CANCELLED = 5
JOB_STATE_SYNCED = 6
_DONE_STATES = (JOB_STATE_DONE, JOB_STATE_SYNCED)

# model.Job JSON shape (the subset the schema store consumes)
JOB_JSON_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("type", LongType()),
    StructField("schema_id", LongType()),
    StructField("table_id", LongType()),
    StructField("schema_name", StringType()),
    StructField("table_name", StringType()),
    StructField("state", LongType()),
    StructField("query", StringType()),
    StructField("binlog", StructType([
        StructField("schema_version", LongType()),
        StructField("finished_ts", LongType()),
    ])),
])

RAW_JOB_SCHEMA = "key binary, value binary, commit_ts long, start_ts long"


def encode_job_row(job_id: int, job_doc: dict, processing: bool) -> bytes:
    """One tidb_ddl_job row image in row-format v2: (job_id, job_meta,
    processing) — the golden encoder for fixtures and the synthesizer."""
    meta = json.dumps(job_doc, separators=(",", ":"), sort_keys=True)
    return encode_row_v2({
        _JOB_ID_COL: encode_value(job_id, "bigint"),
        _JOB_META_COL: meta.encode("utf-8"),
        _PROCESSING_COL: encode_value(1 if processing else 0, "bigint"),
    })


def fetch_ddl_jobs(raw: DataFrame) -> DataFrame:
    """RawKV job-table frames → done DDL jobs, commit-ts ordered.

    Column contract out: (job_id, action_type, schema_id, table_id,
    schema_name, table_name, schema_version, query, start_ts,
    finished_ts).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                key = bytes(r.key)
                try:
                    table_id, _handle = decode_record_key(key)
                except Exception:
                    continue  # not a record key — not a job row
                if table_id != JOB_TABLE_ID:
                    # `mounter.go:205`: invalid tableID in rawKV.Key
                    continue
                buf = bytes(r.value)
                if not buf:
                    continue  # delete of a job row carries no meta
                if is_new_format(buf):
                    cols = decode_row_v2(buf)
                    meta = cols.get(_JOB_META_COL)
                else:
                    v1 = decode_row_v1(buf)
                    entry = v1.get(_JOB_META_COL)
                    meta = entry[1] if entry else None
                if meta is None:
                    continue
                rows.append((bytes(meta).decode("utf-8"),
                             int(r.start_ts), int(r.commit_ts)))
            yield pd.DataFrame(
                rows, columns=["job_meta", "start_ts", "commit_ts"])

    decoded = raw.mapInPandas(
        decode, "job_meta string, start_ts long, commit_ts long")

    job = F.from_json("job_meta", JOB_JSON_SCHEMA).alias("job")
    return (
        decoded.select(job, "start_ts", "commit_ts")
        # parseJob :220-222 — only Done/Synced jobs replay
        .filter(F.col("job.state").isin(*_DONE_STATES))
        .select(
            F.col("job.id").alias("job_id"),
            F.col("job.type").alias("action_type"),
            F.col("job.schema_id").alias("schema_id"),
            F.col("job.table_id").alias("table_id"),
            F.col("job.schema_name").alias("schema_name"),
            F.col("job.table_name").alias("table_name"),
            F.col("job.binlog.schema_version").alias("schema_version"),
            F.col("job.query").alias("query"),
            # :226-229 — entry ts wins over whatever the doc carried
            F.col("start_ts"),
            F.col("commit_ts").alias("finished_ts"),
        )
        .orderBy("finished_ts", "job_id")
    )


# ---------------------------------------------------------------------------
# Deterministic job-table synthesizer (the testdata has no real DDL
# stream): per changelog table rank i, a 4-job tape — create (Done),
# add-column (Synced), a Running job and a Cancelled job that the
# fetcher must drop.
# ---------------------------------------------------------------------------

_JOB_STEP = 100
_JOB_TS_BASE = 2_000_000
_JOB_TS_STEP = 10


def job_tape(schema: str, table: str, i: int) -> list[tuple]:
    """(job_id, doc, processing, start_ts, commit_ts) — the fetch-visible
    jobs have a closed form in the table rank, mirrored by the oracle."""
    base = _JOB_STEP * (i + 1)
    t0 = _JOB_TS_BASE + _JOB_TS_STEP * i

    def doc(off: int, action: int, state: int, version: int, query: str) -> dict:
        return {
            "id": base + off,
            "type": action,
            "schema_id": 1 + i,
            "table_id": 1000 + i,
            "schema_name": schema,
            "table_name": table,
            "state": state,
            "query": query,
            # stale ts in the doc — ParseDDLJob must overwrite both
            "binlog": {"schema_version": version, "finished_ts": 0},
        }

    create = f"CREATE TABLE `{schema}`.`{table}` (id BIGINT PRIMARY KEY)"
    addcol = f"ALTER TABLE `{schema}`.`{table}` ADD COLUMN c1 VARCHAR(16)"
    return [
        (base + 0, doc(0, 3, JOB_STATE_DONE, 1, create), False,
         t0 + 0, t0 + 1),
        (base + 1, doc(1, 5, JOB_STATE_SYNCED, 2, addcol), False,
         t0 + 2, t0 + 3),
        (base + 2, doc(2, 8, JOB_STATE_RUNNING, 3, "DROP INDEX i1"), True,
         t0 + 4, t0 + 5),
        (base + 3, doc(3, 6, JOB_STATE_CANCELLED, 3, "DROP COLUMN c1"), False,
         t0 + 6, t0 + 7),
    ]


def synthesize_job_table(spark, tables: list[tuple[str, str]]) -> DataFrame:
    """Binary RawKV frames for the job tapes of the given tables, plus
    one decoy row in a non-job system table that the fetcher must
    reject by key (`mounter.go:205`)."""
    frames = []
    for i, (s, t) in enumerate(sorted(tables)):
        for job_id, doc, processing, start_ts, commit_ts in job_tape(s, t, i):
            frames.append((
                encode_record_key(JOB_TABLE_ID, job_id),
                encode_job_row(job_id, doc, processing),
                commit_ts, start_ts,
            ))
    # decoy: a row keyed to tidb_ddl_reorg (one id below the job table)
    frames.append((
        encode_record_key(JOB_TABLE_ID - 1, 1),
        encode_job_row(1, {"id": 1, "state": JOB_STATE_DONE}, False),
        _JOB_TS_BASE - 2, _JOB_TS_BASE - 3,
    ))
    return spark.createDataFrame(frames, RAW_JOB_SCHEMA)
