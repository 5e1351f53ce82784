"""Streaming web-curation flagship: the FULL curation stack as a
Structured Streaming job with cross-batch dedup state.

Composes the batch stages (`llm/web.py curation_stages` — paragraph
boilerplate removal → C4 → Gopher → within-batch exact dedup) with an
exact digest state that carries across micro-batches, the same
foreachBatch shape as `streaming/dedup.py` / `streaming/changefeed.py`:

- outputs land under ``out_dir/epoch=N`` (winner docs) and
  ``manifest_dir/epoch=N`` (per-source audit counts), both written with
  per-epoch OVERWRITE so a replayed epoch is idempotent;
- the digest state after epoch N persists under ``state_dir/epoch=N``;
  a crash between the output write and the state write replays the
  epoch from state(N-1) and overwrites both — the
  ``curation/after-output`` failpoint arms that window
  (tests/test_failpoints pattern);
- state is an EXACT digest set (not a Bloom filter): the flagship's
  contract is per-epoch manifest counts equal to the batch pipeline's
  on the same data, so false positives are not acceptable here.
  ``StreamingBloomDedup`` remains the bounded-state scale path when
  approximate is fine; at 100 TB the digest state is still one slim
  column, compacted like the dedup state
  (`streaming/dedup.py _compact_epoch_dirs`).

Rule-stage scope note: paragraph-boilerplate document frequencies are
computed WITHIN each micro-batch (a streaming job cannot see future
paragraphs); this matches the batch pipeline run on the same
micro-batch data, which is exactly the equality the tests pin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamingCurationPipeline:
    def __init__(self, spark: SparkSession, work_dir: str) -> None:
        self.spark = spark
        self.out_dir = os.path.join(work_dir, "curated")
        self.manifest_dir = os.path.join(work_dir, "manifest")
        self.state_dir = os.path.join(work_dir, "digest_state")

    # -- state ---------------------------------------------------------
    def load_state(self, before_epoch: int) -> DataFrame | None:
        """Digest set from the newest epoch strictly before
        ``before_epoch`` (a replayed epoch must not see its own
        output)."""
        if not os.path.isdir(self.state_dir):
            return None
        epochs = [e for d in os.listdir(self.state_dir)
                  if d.startswith("epoch=")
                  and (e := int(d.split("=", 1)[1])) < before_epoch]
        if not epochs:
            return None
        return self.spark.read.parquet(
            os.path.join(self.state_dir, f"epoch={max(epochs)}"))

    # -- foreachBatch body ----------------------------------------------
    def run_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ticdc_spark.llm.web import curation_manifest, curation_stages

        p, c, flagged = curation_stages(batch_df)
        prior = self.load_state(epoch_id)
        if prior is not None:
            # cross-batch dedup: an in-batch winner whose text digest
            # was already emitted in an earlier epoch loses its crown
            seen = F.broadcast(prior.select(F.col("digest").alias("_seen")))
            flagged = (
                flagged.join(seen, F.md5("text") == F.col("_seen"),
                             "left")
                .withColumn("is_winner",
                            F.col("is_winner") & F.col("_seen").isNull())
                .drop("_seen")
            )
        flagged = flagged.cache()
        curation_manifest(p, c, flagged).coalesce(1).write.mode(
            "overwrite").parquet(
            os.path.join(self.manifest_dir, f"epoch={epoch_id}"))
        winners = flagged.filter("is_winner")
        winners.select("doc_id", "source", "text").write.mode(
            "overwrite").parquet(
            os.path.join(self.out_dir, f"epoch={epoch_id}"))

        from ticdc_spark import failpoint

        failpoint.inject("curation/after-output", {"epoch": epoch_id})

        new_state = winners.select(F.md5("text").alias("digest"))
        if prior is not None:
            new_state = prior.unionByName(new_state)
        new_state.distinct().coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"epoch={epoch_id}"))
        p.unpersist()
        c.unpersist()
        flagged.unpersist()

    # -- streaming entry -------------------------------------------------
    def start(self, stream_df: DataFrame, checkpoint_dir: str,
              available_now: bool = True):
        writer = (
            stream_df.writeStream
            .foreachBatch(self.run_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def manifests(self) -> DataFrame:
        # plain directory read: partition discovery finds epoch=N dirs
        # (a glob path here makes the reader probe for streaming-sink
        # metadata first and log a spurious FileNotFound warn)
        return self.spark.read.parquet(self.manifest_dir)

    def output(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.out_dir,
                                                    "epoch=*"))
