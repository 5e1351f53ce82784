"""Streaming curation flagship: per-epoch manifests equal the batch
pipeline on the same micro-batch data, cross-epoch duplicates are
accounted exactly, and a crash between the output and state writes
replays idempotently (the failpoint window)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from ticdc_spark import failpoint
from ticdc_spark.llm.web import curation_pipeline_full, curation_stages
from ticdc_spark.streaming.curation import StreamingCurationPipeline
from ticdc_spark.web_queries import _docs, _full_synth

DOC_SCHEMA = "doc_id long, source string, text string"


@pytest.fixture(autouse=True)
def _clean_failpoints():
    failpoint.disable_all()
    yield
    failpoint.disable_all()


def _epoch_data(spark, sf_dir):
    docs = _full_synth(_docs(spark, sf_dir)).filter("doc_id < 400")
    d0 = docs.filter("doc_id % 2 = 0").cache()
    d1_base = docs.filter("doc_id % 2 = 1")
    # plant cross-epoch duplicates: texts that WON in epoch 0 reappear
    # in epoch 1 under fresh doc_ids — streaming must drop them
    _, _, flagged0 = curation_stages(d0)
    planted_rows = (flagged0.filter("is_winner")
                    .select("source", "text", "word_count")
                    .orderBy("doc_id").limit(3).collect())
    planted = spark.createDataFrame(
        [(100000 + i, r["source"], r["text"])
         for i, r in enumerate(planted_rows)], DOC_SCHEMA)
    d1 = d1_base.unionByName(planted)
    return d0, d1, planted_rows


def _write_epoch_files(stream_in, d0, d1):
    os.makedirs(stream_in)
    for i, d in enumerate((d0, d1)):
        path = os.path.join(stream_in, f"batch_{i}")
        d.coalesce(1).write.parquet(path)
        part = glob.glob(os.path.join(path, "part-*.parquet"))[0]
        dst = os.path.join(stream_in, f"{i:04d}.parquet")
        os.rename(part, dst)
        # FileStreamSource orders by modification time: force it
        os.utime(dst, (1700000000 + i * 100, 1700000000 + i * 100))
    for leftover in glob.glob(os.path.join(stream_in, "batch_*")):
        import shutil

        shutil.rmtree(leftover)


def _run_stream(spark, stream_in, work_dir, ckpt):
    pipe = StreamingCurationPipeline(spark, work_dir)
    stream = (spark.readStream.schema(DOC_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(stream_in))
    q = pipe.start(stream, ckpt)
    q.awaitTermination(240)
    return pipe


def _manifest_pdf(df):
    return (df.toPandas().set_index("source").sort_index())


def test_per_epoch_manifests_match_batch(spark, sf_dir, tmp_path):
    d0, d1, planted = _epoch_data(spark, sf_dir)
    stream_in = str(tmp_path / "in")
    _write_epoch_files(stream_in, d0, d1)
    pipe = _run_stream(spark, stream_in, str(tmp_path / "work"),
                       str(tmp_path / "ckpt"))

    manifests = pipe.manifests()
    assert sorted(r["epoch"] for r in
                  manifests.select("epoch").distinct().collect()) == [0, 1]

    # epoch 0: no prior state — exact equality with the batch pipeline
    m0 = _manifest_pdf(manifests.filter("epoch = 0").drop("epoch"))
    b0 = _manifest_pdf(curation_pipeline_full(d0))
    assert m0.equals(b0), (m0, b0)

    # epoch 1: equal except cross-epoch dups (the plant + any natural
    # repeats, e.g. the %67 snippet docs), which the batch run on D1
    # alone cannot know about — compute the exact expected adjustment
    m1 = _manifest_pdf(manifests.filter("epoch = 1").drop("epoch"))
    b1 = _manifest_pdf(curation_pipeline_full(d1))
    _, _, flagged0 = curation_stages(d0)
    _, _, flagged1 = curation_stages(d1)
    seen0 = flagged0.filter("is_winner").select(
        F.md5("text").alias("d")).distinct()
    crossed = (flagged1.filter("is_winner")
               .join(seen0, F.md5("text") == F.col("d"))
               .groupBy("source")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("word_count").alias("wc")).collect())
    adj_final = {r["source"]: r["n"] for r in crossed}
    adj_tokens = {r["source"]: r["wc"] for r in crossed}
    assert sum(adj_final.values()) >= 3  # at least the plant
    for src in b1.index:
        assert m1.loc[src, "n_docs"] == b1.loc[src, "n_docs"]
        assert m1.loc[src, "paras_removed"] == b1.loc[src, "paras_removed"]
        assert m1.loc[src, "n_after_c4"] == b1.loc[src, "n_after_c4"]
        assert m1.loc[src, "n_after_rules"] == b1.loc[src, "n_after_rules"]
        assert m1.loc[src, "n_final"] == \
            b1.loc[src, "n_final"] - adj_final.get(src, 0)
        assert m1.loc[src, "tokens_final"] == \
            b1.loc[src, "tokens_final"] - adj_tokens.get(src, 0)

    # output winners: planted texts appear exactly once across epochs
    out = pipe.output()
    dup_counts = (out.groupBy(F.md5("text").alias("d"))
                  .count().filter("count > 1").count())
    assert dup_counts == 0


def test_crash_after_output_replays_idempotently(spark, sf_dir, tmp_path):
    d0, d1, _ = _epoch_data(spark, sf_dir)
    stream_in = str(tmp_path / "in")
    _write_epoch_files(stream_in, d0, d1)

    failpoint.enable("curation/after-output", "1*panic")
    pipe = StreamingCurationPipeline(spark, str(tmp_path / "work"))
    stream = (spark.readStream.schema(DOC_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(stream_in))
    q = pipe.start(stream, str(tmp_path / "ckpt"))
    with pytest.raises(Exception):
        q.awaitTermination(240)
        if q.exception() is not None:
            raise RuntimeError(q.exception())
    # epoch 0's output landed but its state did not — the armed window
    assert glob.glob(os.path.join(pipe.out_dir, "epoch=0", "*.parquet"))
    assert not os.path.isdir(pipe.state_dir) or not glob.glob(
        os.path.join(pipe.state_dir, "epoch=0", "*.parquet"))

    failpoint.disable_all()
    # restart from the same checkpoint: epoch 0 replays, overwrites its
    # half-written output, and the run completes
    pipe2 = _run_stream(spark, stream_in, str(tmp_path / "work"),
                        str(tmp_path / "ckpt"))
    m0 = _manifest_pdf(pipe2.manifests().filter("epoch = 0").drop("epoch"))
    b0 = _manifest_pdf(curation_pipeline_full(d0))
    assert m0.equals(b0)
    # both epochs present, no duplicate winners
    assert sorted(r["epoch"] for r in pipe2.manifests()
                  .select("epoch").distinct().collect()) == [0, 1]
    dup_counts = (pipe2.output().groupBy(F.md5("text"))
                  .count().filter("count > 1").count())
    assert dup_counts == 0
