"""Changefeed lifecycle on Structured Streaming (SURVEY §3.1/§3.2).

The reference's changefeed is a named, restartable pipeline
(`pkg/config/changefeed.go:252-281`) scheduled by a
coordinator/maintainer over many nodes; here the whole control plane
collapses into one ``StreamingQuery``:

- create   = build DataFrame DAG + ``writeStream.start()``
- pause    = ``query.stop()`` (checkpoint keeps offsets)
- resume   = ``start()`` with the same checkpoint dir
- remove   = stop + delete checkpoint
- checkpointTs (A2: min over dispatcher watermarks,
  `maintainer/maintainer.go:83-88`) = per-batch max commit_ts recorded in
  the progress log written by foreachBatch

The data plane transform is EXACTLY the batch pipeline
(`pipeline.build_pipeline``) applied inside the micro-batch — batch and
streaming share one operator implementation, the core Spark-first win.
At scale the source swaps for Kafka and sinks write per-partition; the
foreachBatch body already routes/partitions accordingly.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ticdc_spark import failpoint
from ticdc_spark.pipeline import ChangefeedConfig
from ticdc_spark.sources.changelog import stream_changelog


def bootstrap_from_sink_uri(cfg) -> str | None:
    """host:port from a kafka:// sink URI — what a deployment passes as
    ``live_bootstrap`` so the changefeed config alone selects the live
    endpoint (first server of a comma-separated bootstrap list)."""
    from urllib.parse import urlsplit

    uri = getattr(cfg, "sink_uri", None) or ""
    u = urlsplit(uri)
    if u.scheme != "kafka" or not u.netloc:
        return None
    return u.netloc.split(",")[0]


def bump_schema_registry(path: str, ddl: dict) -> None:
    """Append a schema-version line for ``ddl`` — idempotent per DDL
    identity ``(ddl_ts, query)``.

    A crash between this append and the DDLTsBook record replays the
    DDL; the replay must not double-bump the version (consumers key on
    version numbers).  Identity is the (commit_ts, query) PAIR, not
    commit_ts alone: a multi-statement batch commits several distinct
    DDLs at one ts, and each must get its own version line.  A line
    with this identity already present means the bump happened — skip
    the append; version = distinct identities + 1."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    seen: set[tuple[int, str]] = set()
    if os.path.exists(path):
        with open(path) as f:
            for ln in f:
                if ln.strip():
                    doc = json.loads(ln)
                    seen.add((doc["ddl_ts"], doc.get("query", "")))
    if (ddl["commit_ts"], ddl.get("query", "")) in seen:
        return
    with open(path, "a") as f:
        f.write(json.dumps({
            "version": len(seen) + 1,
            "ddl_ts": ddl["commit_ts"],
            "schema_name": ddl.get("schema_name", ""),
            "table_name": ddl.get("table_name", ""),
            "query": ddl.get("query", ""),
        }) + "\n")


class Changefeed:
    """One changefeed = one Structured Streaming query + checkpoint dir."""

    def __init__(
        self,
        changefeed_id: str,
        cfg: ChangefeedConfig,
        work_dir: str,
        compression: str | None = None,
        live_bootstrap: str | None = None,
        epoch_offset: int = 0,
    ) -> None:
        self.changefeed_id = changefeed_id
        self.cfg = cfg
        self.work_dir = work_dir
        self.compression = compression
        # epoch-id namespace shift: a resume with overwrite_checkpoint_ts
        # deletes the stream checkpoint (fresh offsets restart epoch ids
        # at 0), so the rewound run writes epoch={offset+id} dirs and
        # cannot clobber the epochs the pre-rewind run already delivered
        # (`api/v2/changefeed.go:785-790` ResumeChangefeed overwrite)
        self.epoch_offset = epoch_offset
        # live MQ mode: produce epochs to a Kafka wire endpoint instead of
        # the filesystem sink (at-least-once like the reference; replays
        # append duplicates the consumer's idempotent apply absorbs)
        self.live_bootstrap = live_bootstrap
        # planted DDL events (the logservice/schemastore feed in the
        # reference; a deployment wires the DDL job fetcher here): each
        # {"commit_ts", "schema_name", "table_name", "query", "ddl_type"}.
        # A DDL whose ts falls inside a micro-batch splits it at the
        # barrier (W3), broadcasts the canal-json DDL message to every
        # partition on the wire (reference MQ behavior), and bumps the
        # schema-version registry — exactly once across epoch replays
        # via the DDLTsBook.
        self.ddl_events = None
        self.checkpoint_dir = os.path.join(work_dir, "checkpoint", changefeed_id)
        self.sink_dir = os.path.join(work_dir, "sink", changefeed_id)
        self.progress_path = os.path.join(work_dir, "progress", f"{changefeed_id}.jsonl")
        self.query = None
        self._sink_compile = None

    # -- sink --------------------------------------------------------------
    def _foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """Ordered sink write + resolved-ts bookkeeping (W1/A2).

        Rows are clustered by topic/partition and written sorted on the
        replay key, mirroring the reference's per-dispatcher ordered flush;
        the per-batch watermark (max commit_ts) is appended to the progress
        log — the changefeed's checkpointTs.
        """
        if batch_df.isEmpty():
            return
        epoch_id += self.epoch_offset  # rewind-generation namespace
        # chaos hook: crash BEFORE any sink effect — a restart must
        # re-deliver this epoch from the stream checkpoint with no loss
        failpoint.inject("changefeed/before-flush", {"epoch": epoch_id})
        # resolved-ts comes from the PRE-compile frame: a compiled DB stmt
        # batch drops commit_ts, but the checkpoint must still advance for
        # MySQL sinks (the reference advances checkpointTs for every sink);
        # otherwise /synced stays false, syncpoints skip, and gc_safepoint
        # ignores the changefeed
        pre_df = batch_df
        # [consistent] level=eventual: persist the redo WAL for this
        # epoch BEFORE the sink flush (the reference's ordering — redo
        # logs must be durable before the sink may apply, so recovery
        # can replay them; `downstreamadapter/sink/redo`).  Applies on
        # the DB/storage paths where the pre-compile frame still
        # carries the row images; per-epoch overwrite keeps replay
        # idempotent like the sink write below.
        consistent = getattr(self.cfg, "consistent", None) or {}
        if (consistent.get("level", "none") == "eventual"
                and "after" in pre_df.columns):
            from ticdc_spark.sinks.redo import redo_log_files

            redo_log_files(pre_df).select("file_name", "value").write \
                .mode("overwrite").format("json").save(os.path.join(
                    self.work_dir, "redo", self.changefeed_id,
                    f"epoch={epoch_id}"))
        if self._sink_compile is not None:
            # DB/storage sinks compile at flush time (windows/aggregates
            # are batch-only constructs) — reference shape: the sink owns
            # batching/SQL-gen at write, not the stream DAG
            batch_df = self._sink_compile(batch_df)
        cols = set(batch_df.columns)
        # sink-shape dispatch (compile_changefeed): MQ frames carry
        # value/topic, DB SQL batches carry stmt, storage frames carry
        # path/file_name
        if "stmt" in cols:
            out_cols = [c for c in ("schema_name", "table_name", "stmt")
                        if c in cols]
        elif "path" in cols:
            out_cols = ["path", "file_name", "value"]
        else:
            out_cols = [c for c in ("topic", "partition", "value")
                        if c in cols]
        sort_cols = [c for c in ("commit_ts", "start_ts", "dml_order", "seq")
                     if c in cols]
        ordered = (
            batch_df.sortWithinPartitions(*sort_cols)
            if sort_cols else batch_df
        )
        live_mq = self.live_bootstrap is not None and "stmt" not in cols \
            and "path" not in cols
        if live_mq:
            # real wire produce (flexible Produce record batches from
            # executors); no filesystem sink — a Kafka changefeed's only
            # artifacts are the broker log + the progress bookkeeping below
            from ticdc_spark.sinks.kafka_live import produce_frame

            live_cols = [c for c in ("topic", "partition", "key", "value")
                         if c in cols]
            barriers = self._pending_ddl_barriers(ordered, cols)
            if barriers:
                from ticdc_spark.streaming.barrier import split_batch_at_ddl

                by_ts = {d["commit_ts"]: d for d in (self.ddl_events or [])}
                topics = [r["topic"] for r in
                          ordered.select("topic").distinct().collect()]
                book = self._ddl_book()
                # cut the epoch at each barrier: pre rows flush, the DDL
                # message broadcasts to every partition, post rows flush
                # against the bumped schema version (W3 on the live wire)
                split_batch_at_ddl(
                    ordered.select(*live_cols, "commit_ts"),
                    barriers,
                    lambda seg, _i: produce_frame(
                        seg.select(*live_cols), self.live_bootstrap),
                    lambda ts: self._apply_live_ddl(by_ts[ts], topics, book),
                )
            else:
                produce_frame(ordered.select(*live_cols), self.live_bootstrap)
        # mode=overwrite per epoch dir: foreachBatch retries re-run with
        # the SAME epoch_id, so the write is idempotent under replay —
        # the Spark analog of the reference's replace-mode dedup on
        # restart (`basic_dispatcher.go:156-161`)
        writer = None if live_mq else (
            ordered.select(*(out_cols or ["value"]))
            .write.mode("overwrite")
            .partitionBy(*[c for c in ("topic",) if c in out_cols])
            .format("json")
        )
        if writer is not None:
            if self.compression:  # lz4/snappy/zstd analog (pkg/compression)
                writer = writer.option("compression", self.compression)
            writer.save(os.path.join(self.sink_dir, f"epoch={epoch_id}"))
        # chaos hook: crash AFTER the sink effect but BEFORE progress
        # bookkeeping — restart re-delivers the epoch; the overwrite
        # above makes the replay idempotent
        failpoint.inject("changefeed/after-flush", {"epoch": epoch_id})
        ts_df = batch_df if "commit_ts" in cols else (
            pre_df if "commit_ts" in pre_df.columns else None
        )
        if ts_df is not None:
            stats = ts_df.agg(
                F.max("commit_ts").alias("resolved_ts"),
                F.min("commit_ts").alias("min_ts"),
                F.count(F.lit(1)).alias("n_rows"),
            ).collect()[0]
            self._write_resolved_frame(ts_df, epoch_id)
        else:  # no ts anywhere; progress is row-count only
            stats = {"resolved_ts": None, "min_ts": None,
                     "n_rows": batch_df.count()}
        os.makedirs(os.path.dirname(self.progress_path), exist_ok=True)
        # epoch replay (crash between flush and this point) must not
        # double-count rows: drop any prior entry for this epoch
        if os.path.exists(self.progress_path):
            with open(self.progress_path) as f:
                kept = [ln for ln in f if json.loads(ln)["epoch"] != epoch_id]
            with open(self.progress_path, "w") as f:
                f.writelines(kept)
        with open(self.progress_path, "a") as f:
            f.write(json.dumps({
                "changefeed": self.changefeed_id,
                "epoch": epoch_id,
                "resolved_ts": stats["resolved_ts"],
                "rows": stats["n_rows"],
                "wall_ts": time.time(),
            }) + "\n")
        if (getattr(self.cfg, "enable_sync_point", False)
                and stats["resolved_ts"] is not None):
            self._write_syncpoints(stats["min_ts"], stats["resolved_ts"])
        if live_mq and stats["resolved_ts"] is not None:
            self._produce_live_watermarks(batch_df, int(stats["resolved_ts"]))

    def _ddl_book(self):
        from ticdc_spark.streaming.barrier import DDLTsBook

        return DDLTsBook(os.path.join(
            self.work_dir, "ddl", f"{self.changefeed_id}.book.jsonl"))

    def _pending_ddl_barriers(self, ordered: DataFrame, cols: set) -> list[int]:
        """Unapplied DDL commit timestamps at or below this batch's max
        commit ts (barriers beyond the batch wait for a later epoch)."""
        if not self.ddl_events or "commit_ts" not in cols:
            return []
        book = self._ddl_book()
        pending = sorted(d["commit_ts"] for d in self.ddl_events
                         if book.should_apply(d["commit_ts"]))
        if not pending:
            return []
        mx = ordered.agg(F.max("commit_ts")).first()[0]
        return [t for t in pending if mx is not None and t <= mx]

    def _apply_live_ddl(self, ddl: dict, topics: list[str], book) -> None:
        """Exactly-once DDL application at the barrier: broadcast the
        canal-json DDL message (`canal_json_encoder.go:384-399` frame)
        to EVERY partition of every routed topic — the reference MQ
        sink's DDL broadcast — then bump the schema-version registry and
        mark the ts applied.  A crash between broadcast and record
        re-broadcasts on replay (at-least-once, consumer dedups), the
        same contract as the data path."""
        from ticdc_spark.codec.canal_json import CANAL_DDL_EVENT_TYPE
        from ticdc_spark.codec.kafka_wire import Record
        from ticdc_spark.sinks.kafka_client import KafkaConn

        etype = CANAL_DDL_EVENT_TYPE.get(ddl.get("ddl_type", ""), "QUERY")
        value = (
            '{"id":0,"database":"%s","table":"%s","pkNames":null,'
            '"isDdl":true,"type":"%s","es":%d,"ts":0,"sql":"%s",'
            '"sqlType":null,"mysqlType":null,"data":null,"old":null}'
            % (ddl.get("schema_name", ""), ddl.get("table_name", ""),
               etype, ddl["commit_ts"] // 1000,
               ddl.get("query", "").replace('"', '\\"'))
        ).encode()
        with KafkaConn.from_bootstrap(self.live_bootstrap) as conn:
            md = conn.metadata(topics)
            for topic in topics:
                for p in [pt["index"]
                          for pt in md["topics"][topic]["partitions"]]:
                    conn.produce(topic, p, [Record(None, value)])
        # chaos hook: crash AFTER the wire broadcast but BEFORE the
        # registry bump + DDLTsBook record (the reference's
        # checkpoint_race_ddl_crash window) — restart replays the epoch
        # and re-broadcasts (at-least-once on the wire, consumer
        # dedups), but the version bump and the book entry must land
        # exactly once
        failpoint.inject("changefeed/after-ddl-broadcast",
                         {"ts": ddl["commit_ts"]})
        # schema-version registry bump (the SchemaStore's multi-version
        # append; file-backed like the rest of the control plane)
        path = os.path.join(self.work_dir, "schema_versions",
                            f"{self.changefeed_id}.jsonl")
        bump_schema_registry(path, ddl)
        book.record(ddl["commit_ts"])

    def _produce_live_watermarks(self, batch_df: DataFrame, resolved_ts: int) -> None:
        """W1 live: after the flush, broadcast the epoch's resolved ts as a
        canal-json TIDB_WATERMARK message to EVERY partition of every topic
        seen this epoch (the reference's kafka sink broadcasts checkpoint
        events exactly like DDLs — `canal_json_encoder.go:406-441` +
        broadcast; see canal_checkpoints / kafka_ddl_broadcast)."""
        from ticdc_spark.sinks.kafka_client import KafkaConn
        from ticdc_spark.codec.kafka_wire import Record

        topics = [r["topic"] for r in batch_df.select("topic").distinct().collect()]
        value = (
            '{"id":0,"database":"","table":"","pkNames":null,"isDdl":false,'
            '"type":"TIDB_WATERMARK","es":%d,"ts":0,"sql":"","sqlType":null,'
            '"mysqlType":null,"data":null,"old":null,'
            '"_tidb":{"watermarkTs":%d}}' % (resolved_ts // 1000, resolved_ts)
        ).encode()
        with KafkaConn.from_bootstrap(self.live_bootstrap) as conn:
            md = conn.metadata(topics)
            for topic in topics:
                for p in [pt["index"] for pt in md["topics"][topic]["partitions"]]:
                    conn.produce(topic, p, [Record(None, value)])

    def _write_resolved_frame(self, ts_df: DataFrame, epoch_id: int) -> None:
        """W1 on the wire: the per-dispatcher watermarks of this epoch
        as ONE BatchResolvedEvent frame (`resolved_ts_event.go`,
        codec/resolved_event.py) — the artifact a mixed deployment's
        consumer reads to advance its frontier.  Per-table max is a
        control-plane aggregate (one row per dispatcher); the write is
        per-epoch overwrite, idempotent under foreachBatch replay."""
        if "table_id" not in ts_df.columns:
            return
        from ticdc_spark.codec.resolved_event import (
            ResolvedEvent,
            encode_batch,
        )

        per_tbl = ts_df.groupBy("table_id").agg(
            F.max("commit_ts").alias("ts"),
            (F.max("seq") if "seq" in ts_df.columns
             else F.lit(0)).alias("seq"),
        ).collect()
        events = [
            ResolvedEvent(int(r["ts"]), int(epoch_id), int(r["seq"] or 0),
                          (int(r["table_id"]), 0))
            for r in sorted(per_tbl, key=lambda r: r["table_id"])
        ]
        path = os.path.join(self.work_dir, "resolved", self.changefeed_id)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, f"epoch={epoch_id}.bin"), "wb") as f:
            f.write(encode_batch(events))

    def _write_syncpoints(self, min_ts: int, resolved_ts: int) -> None:
        """W2 syncpoint writer (`mysql_writer_for_syncpoint.go:33-67`):
        every crossed multiple of sync-point-interval up to the batch's
        resolved ts is upserted once — `CalculateStartSyncPointTs`
        (`downstreamadapter/syncpoint/sync_point.go:28-39`) rounds the
        start UP to the next interval multiple. Driver-side: one line of
        arithmetic per micro-batch, no data-plane cost."""
        interval = self.cfg.sync_point_interval_us
        path = os.path.join(self.work_dir, "syncpoint",
                            f"{self.changefeed_id}.jsonl")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        last = 0
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    last = json.loads(line)["primary_ts"]
        # first boundary strictly above what's already written, anchored
        # at the stream's own ts domain (commit_ts is epoch-micros, so
        # anchoring at 0 would enumerate ~50 years of boundaries)
        start = ((max(last, min_ts - 1) // interval) + 1) * interval
        with open(path, "a") as f:
            for ts in range(start, resolved_ts + 1, interval):
                f.write(json.dumps({
                    "changefeed": self.changefeed_id,
                    "primary_ts": ts,
                    "secondary_ts": resolved_ts,
                    "created_at": time.time(),
                }) + "\n")

    # -- lifecycle ---------------------------------------------------------
    def start(self, spark: SparkSession, sf_dir: str, available_now: bool = True):
        from ticdc_spark.pipeline import (
            DB_SCHEMES, STORAGE_SCHEMES, build_pipeline, build_pipeline_uncoded,
            compile_sink_tail, sink_scheme,
        )

        cl = stream_changelog(spark, sf_dir)
        scheme = sink_scheme(self.cfg)
        if scheme in DB_SCHEMES or scheme in STORAGE_SCHEMES:
            # stream the streaming-safe filter prefix; the sink-specific
            # tail (compaction windows, SQL batching, file layout) runs
            # per micro-batch in _foreach_batch
            out = build_pipeline_uncoded(cl, self.cfg)
            self._sink_compile = lambda df: compile_sink_tail(df, self.cfg)
        else:
            out = build_pipeline(cl, self.cfg)
            self._sink_compile = None
        writer = (
            out.writeStream.foreachBatch(self._foreach_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName(f"changefeed_{self.changefeed_id}")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        self.query = writer.start()
        return self.query

    def wait(self, timeout_s: float = 300.0) -> None:
        assert self.query is not None
        self.query.awaitTermination(timeout_s)

    def stop(self) -> None:
        if self.query is not None and self.query.isActive:
            self.query.stop()

    def stats(self) -> dict:
        """Changefeed statistics (cli_changefeed_statistics.go shape):
        totals + throughput derived from the progress log."""
        if not os.path.exists(self.progress_path):
            return {"epochs": 0, "rows": 0, "rows_per_sec": None}
        entries = []
        with open(self.progress_path) as f:
            for line in f:
                entries.append(json.loads(line))
        rows = sum(e["rows"] for e in entries)
        elapsed = entries[-1]["wall_ts"] - entries[0]["wall_ts"]
        return {
            "epochs": len(entries),
            "rows": rows,
            "rows_per_sec": round(rows / elapsed, 1) if elapsed > 0 else None,
        }

    def checkpoint_ts(self) -> int | None:
        """Latest resolved ts from the progress log (A2)."""
        if not os.path.exists(self.progress_path):
            return None
        last = None
        with open(self.progress_path) as f:
            for line in f:
                last = json.loads(line)
        return last["resolved_ts"] if last else None
