"""Streaming incremental dedup: Bloom filter as cross-batch state.

The batch-side Bloom operators (`llm/corpus.py`) compose into the
ingest-time dedup every training-data pipeline runs: each micro-batch
drops rows whose content digest was already admitted by a PRIOR batch,
then folds its own digests into the filter.  State is the Bloom word
table — bounded by ``BLOOM_WORDS`` rows no matter how much history has
flowed through, which is what makes the pattern viable at 100 TB: the
"have I seen this" structure stays broadcastable forever, instead of an
ever-growing seen-keys table that every batch must shuffle against.

Semantics (the standard Bloom dedup trade):
- a true duplicate of an admitted row is ALWAYS dropped (no false
  negatives — the filter contract, pinned in tests);
- a unique row may be dropped at the false-positive rate of the filter
  sizing (documented in `llm/corpus.py`); size the filter for the
  expected key volume to bound the loss.

Exactly-once shape mirrors `streaming/changefeed.py`: per-epoch
OVERWRITE of both output and state keyed by epoch id, so a replayed
epoch recomputes byte-identical results (state(N) is a deterministic
function of state(N-1) + batch N).
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ticdc_spark.llm.corpus import bloom_build, bloom_probe


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Word-wise OR of two filters — associativity is pinned by
    test_corpus_ops.test_bloom_merge_associative."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
    )


class StreamingBloomDedup:
    """foreachBatch driver for digest-dedup with Bloom state.

    ``run_batch(batch_df, epoch_id)`` is the foreachBatch body; it also
    works as a plain batch fold for tests.  Output rows land under
    ``out_dir/epoch=N``; the filter after epoch N persists under
    ``state_dir/epoch=N`` (latest epoch wins on load, so a crash between
    the two writes replays the epoch idempotently).
    """

    def __init__(self, spark: SparkSession, work_dir: str,
                 key_col: str = "text") -> None:
        self.spark = spark
        self.key_col = key_col
        self.out_dir = os.path.join(work_dir, "deduped")
        self.state_dir = os.path.join(work_dir, "bloom_state")

    # -- state ---------------------------------------------------------
    def _latest_epoch(self) -> int | None:
        if not os.path.isdir(self.state_dir):
            return None
        epochs = [int(d.split("=", 1)[1])
                  for d in os.listdir(self.state_dir)
                  if d.startswith("epoch=")]
        return max(epochs) if epochs else None

    def load_bloom(self, before_epoch: int) -> DataFrame | None:
        """Filter state from the newest epoch strictly before
        ``before_epoch`` (replays must not see their own output)."""
        if not os.path.isdir(self.state_dir):
            return None
        epochs = [e for d in os.listdir(self.state_dir)
                  if d.startswith("epoch=")
                  and (e := int(d.split("=", 1)[1])) < before_epoch]
        if not epochs:
            return None
        return self.spark.read.parquet(
            os.path.join(self.state_dir, f"epoch={max(epochs)}"))

    # -- the fold ------------------------------------------------------
    def run_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        digested = batch_df.withColumn("_digest", F.md5(self.key_col))
        # within-batch exact dedup first (cheap, no FP risk): keep the
        # first row per digest in a deterministic order
        in_batch = digested.dropDuplicates(["_digest"])
        prior = self.load_bloom(epoch_id)
        if prior is not None:
            hits = bloom_probe(
                in_batch.select(F.col("_digest").alias("key")), prior)
            kept = (
                in_batch.join(
                    hits.filter(~F.col("bloom_hit"))
                    .select(F.col("key").alias("_digest")),
                    "_digest")
            )
        else:
            kept = in_batch
        kept.drop("_digest").write.mode("overwrite").parquet(
            os.path.join(self.out_dir, f"epoch={epoch_id}"))
        # chaos hook: crash AFTER the output write but BEFORE the state
        # write — the replayed epoch re-reads state(N-1) and overwrites
        # both, so the half-written epoch heals (tests/test_failpoints)
        from ticdc_spark import failpoint

        failpoint.inject("dedup/after-output", {"epoch": epoch_id})
        new_words = bloom_build(
            kept.select(F.col("_digest").alias("key")))
        if prior is not None:
            new_words = merge_blooms(prior, new_words)
        new_words.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"epoch={epoch_id}"))

    # -- streaming entry ----------------------------------------------
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

    def output(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.out_dir,
                                                    "epoch=*"))


def _compact_epoch_dirs(spark: SparkSession, state_dir: str,
                        upto_epoch: int,
                        repartition_cols: list[str] | None = None) -> None:
    """Fold every state epoch <= ``upto_epoch`` into one snapshot dir so
    the per-batch state read stays one snapshot + recent epochs instead
    of O(n_epochs) directories.  Write-to-tmp then swap keeps a crash
    mid-compaction recoverable (either layout is complete)."""
    import shutil

    dirs = sorted(
        (int(d.split("=", 1)[1]), os.path.join(state_dir, d))
        for d in os.listdir(state_dir)
        if d.startswith("epoch=") and int(d.split("=", 1)[1]) <= upto_epoch
    )
    if len(dirs) <= 1:
        return
    merged = spark.read.parquet(*[p for _, p in dirs])
    if repartition_cols:
        merged = merged.repartition(*repartition_cols)
    tmp = os.path.join(state_dir, f"_compact_tmp_{upto_epoch}")
    merged.write.mode("overwrite").parquet(tmp)
    for _, p in dirs:
        shutil.rmtree(p)
    os.rename(tmp, os.path.join(state_dir, f"epoch={dirs[-1][0]}"))


# ---------------------------------------------------------------------------
# Near-dup (MinHash-LSH) streaming dedup
# ---------------------------------------------------------------------------
class StreamingMinHashDedup:
    """Cross-batch NEAR-duplicate suppression — the LSH counterpart of
    :class:`StreamingBloomDedup`.

    State per admitted doc: its ``N_BANDS`` (band, bucket) keys plus the
    ``NUM_PERM``-long minhash signature (a few dozen bytes — shingle
    sets are never stored).  An incoming doc is dropped when it shares a
    band bucket with an admitted doc AND their signatures agree on
    ``min_agree`` of the hashes (estimated Jaccard ≥ min_agree/NUM_PERM
    — the standard signature-level verify; exact-shingle verify would
    require keeping full shingle sets in state).

    Scale shape: state is an append-only table partitioned by the
    (band, bucket) join key — at 100 TB this is a bucketed table and the
    probe is a key-equi-join touching only colliding buckets, O(corpus)
    storage but O(collisions) work per batch.  Within a batch, greedy
    lowest-doc-id-wins (deterministic).
    """

    def __init__(self, spark: SparkSession, work_dir: str,
                 min_agree: int = 6) -> None:
        from ticdc_spark.llm.dedup import NUM_PERM

        assert 1 <= min_agree <= NUM_PERM
        self.spark = spark
        self.min_agree = min_agree
        self.out_dir = os.path.join(work_dir, "near_deduped")
        self.state_dir = os.path.join(work_dir, "lsh_state")

    def _sig_bands(self, docs: DataFrame) -> DataFrame:
        from ticdc_spark.llm.dedup import N_BANDS, NUM_PERM, minhash_signature

        sig = minhash_signature(docs)
        return sig.select(
            "doc_id",
            F.array(*[F.col(f"mh{i}") for i in range(NUM_PERM)]).alias("sig"),
            F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"),
                         F.col(f"band{b}").alias("bucket"))
                for b in range(N_BANDS)
            ])).alias("bb"),
        ).select("doc_id", "sig", "bb.band", "bb.bucket")

    def _agree(self, a: str, b: str):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
            F.lit(0), lambda acc, x: acc + x)

    def load_state(self, before_epoch: int) -> DataFrame | None:
        if not os.path.isdir(self.state_dir):
            return None
        dirs = [os.path.join(self.state_dir, d)
                for d in os.listdir(self.state_dir)
                if d.startswith("epoch=")
                and int(d.split("=", 1)[1]) < before_epoch]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    def run_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        sb = self._sig_bands(batch_df)
        # in-batch: drop any doc agreeing with a LOWER-id doc
        a, b = sb.alias("a"), sb.alias("b")
        in_batch_dups = (
            a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("b.doc_id") < F.col("a.doc_id")))
            .filter(self._agree("a.sig", "b.sig") >= self.min_agree)
            .select(F.col("a.doc_id").alias("doc_id")).distinct()
        )
        survivors = sb.join(in_batch_dups, "doc_id", "left_anti")
        prior = self.load_state(epoch_id)
        if prior is not None:
            p = prior.alias("p")
            cross_dups = (
                survivors.alias("n")
                .join(p, (F.col("n.band") == F.col("p.band"))
                      & (F.col("n.bucket") == F.col("p.bucket")))
                .filter(self._agree("n.sig", "p.sig") >= self.min_agree)
                .select(F.col("n.doc_id").alias("doc_id")).distinct()
            )
            survivors = survivors.join(cross_dups, "doc_id", "left_anti")
        admitted_ids = survivors.select("doc_id").distinct()
        batch_df.join(admitted_ids, "doc_id").write.mode(
            "overwrite").parquet(os.path.join(self.out_dir,
                                              f"epoch={epoch_id}"))
        survivors.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"epoch={epoch_id}"))

    def output(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.out_dir,
                                                    "epoch=*"))

    def compact_state(self, upto_epoch: int) -> None:
        """Merge state epochs <= ``upto_epoch`` into one snapshot,
        repartitioned on the (band, bucket) probe key — run this every K
        epochs so the probe join reads one well-partitioned table
        instead of O(n_epochs) directories."""
        _compact_epoch_dirs(self.spark, self.state_dir, upto_epoch,
                            repartition_cols=["band", "bucket"])
