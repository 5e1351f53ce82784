"""Streaming Bloom dedup (`streaming/dedup.py`): cross-batch duplicate
suppression with bounded state, replay idempotence, and the no-false-
negative contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ticdc_spark.llm.corpus import BLOOM_WORDS
from ticdc_spark.streaming.dedup import StreamingBloomDedup


def _docs(spark, texts, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def test_cross_batch_duplicates_dropped(spark, tmp_path):
    d = StreamingBloomDedup(spark, str(tmp_path))
    d.run_batch(_docs(spark, ["alpha", "beta", "gamma", "beta"]), 0)
    # batch 1 repeats two admitted texts and adds two new ones
    d.run_batch(_docs(spark, ["beta", "delta", "alpha", "epsilon"], 10), 1)
    out = d.output()
    texts = sorted(r.text for r in out.collect())
    assert texts == ["alpha", "beta", "delta", "epsilon", "gamma"]
    # the in-batch dup kept exactly one copy
    assert out.filter("text = 'beta'").count() == 1


def test_no_false_negatives_over_many_batches(spark, tmp_path):
    """Every admitted text re-offered later MUST be dropped — the Bloom
    contract composed across batches."""
    d = StreamingBloomDedup(spark, str(tmp_path))
    for e in range(4):
        d.run_batch(
            _docs(spark, [f"doc-{e}-{i}" for i in range(50)], e * 100), e)
    # epoch 4 re-offers one text from each earlier epoch
    d.run_batch(_docs(spark, [f"doc-{e}-7" for e in range(4)], 900), 4)
    out = d.output()
    assert out.count() == 200  # nothing from epoch 4 admitted
    assert out.select("text").distinct().count() == 200


def test_state_is_bounded(spark, tmp_path):
    d = StreamingBloomDedup(spark, str(tmp_path))
    for e in range(3):
        d.run_batch(
            _docs(spark, [f"t-{e}-{i}" for i in range(80)], e * 100), e)
    state = spark.read.parquet(os.path.join(d.state_dir, "epoch=2"))
    assert state.count() <= BLOOM_WORDS


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """Re-running an epoch (foreachBatch retry) must reproduce identical
    output and state — the per-epoch overwrite + state(N-1) read."""
    d = StreamingBloomDedup(spark, str(tmp_path))
    d.run_batch(_docs(spark, ["a", "b", "c"]), 0)
    b1 = _docs(spark, ["b", "x", "y"], 10)
    d.run_batch(b1, 1)
    first = sorted(r.text for r in spark.read.parquet(
        os.path.join(d.out_dir, "epoch=1")).collect())
    state_first = sorted(
        tuple(r) for r in spark.read.parquet(
            os.path.join(d.state_dir, "epoch=1")).collect())
    d.run_batch(b1, 1)  # replay
    again = sorted(r.text for r in spark.read.parquet(
        os.path.join(d.out_dir, "epoch=1")).collect())
    state_again = sorted(
        tuple(r) for r in spark.read.parquet(
            os.path.join(d.state_dir, "epoch=1")).collect())
    assert first == again == ["x", "y"]
    assert state_first == state_again


def test_real_stream_end_to_end(spark, tmp_path):
    """availableNow file stream, one file per trigger: three batches
    with overlaps dedupe across micro-batch boundaries."""
    src = tmp_path / "src"
    for i, texts in enumerate([["m", "n"], ["n", "o"], ["o", "p", "m"]]):
        _docs(spark, texts, i * 10).coalesce(1).write.mode(
            "overwrite").parquet(str(src / f"f{i}"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*"))
    )
    d = StreamingBloomDedup(spark, str(tmp_path / "work"))
    q = d.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(240)
    texts = sorted(r.text for r in d.output().collect())
    assert texts == ["m", "n", "o", "p"]


# -- near-dup (MinHash-LSH) streaming ---------------------------------------

def test_near_dup_cross_batch(spark, tmp_path):
    from ticdc_spark.streaming.dedup import StreamingMinHashDedup

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    near = base + " indeed"   # one appended token: Jaccard ≈ 0.95
    far = ("completely different words about spark shuffles and "
           "partitions joining large tables with broadcast hints")
    d = StreamingMinHashDedup(spark, str(tmp_path))
    d.run_batch(_docs(spark, [base, far]), 0)
    # batch 1: exact dup, near dup, and a genuinely new doc
    fresh = ("entirely novel content mentioning bloom filters minhash "
             "bands buckets and signature agreement thresholds")
    d.run_batch(_docs(spark, [base, near, fresh], 10), 1)
    texts = sorted(r.text for r in d.output().collect())
    assert base in texts and far in texts and fresh in texts
    assert near not in texts          # near-dup suppressed cross-batch
    assert len(texts) == 3


def test_near_dup_in_batch_lowest_id_wins(spark, tmp_path):
    from ticdc_spark.streaming.dedup import StreamingMinHashDedup

    t = ("some repeated content that appears twice in one single batch "
         "with enough tokens to shingle properly and hash stable")
    d = StreamingMinHashDedup(spark, str(tmp_path))
    d.run_batch(_docs(spark, [t, t]), 0)
    out = d.output().collect()
    assert len(out) == 1 and out[0].doc_id == 0


def test_near_dup_replay_idempotent(spark, tmp_path):
    from ticdc_spark.streaming.dedup import StreamingMinHashDedup

    d = StreamingMinHashDedup(spark, str(tmp_path))
    a = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon")
    d.run_batch(_docs(spark, [a]), 0)
    b1 = _docs(spark, [a + " extra", "unrelated totally new words "
                       "with different shingles entirely here"], 10)
    d.run_batch(b1, 1)
    first = sorted(r.doc_id for r in d.output().collect())
    d.run_batch(b1, 1)  # replay epoch 1
    again = sorted(r.doc_id for r in d.output().collect())
    assert first == again


def test_near_dup_state_compaction(spark, tmp_path):
    """compact_state folds old epoch dirs into one snapshot without
    changing dedup behavior."""
    import os

    from ticdc_spark.streaming.dedup import StreamingMinHashDedup

    d = StreamingMinHashDedup(spark, str(tmp_path))
    texts = [
        "first corpus document about spark partitions and shuffles here",
        "second corpus document mentioning bloom filters and minhash",
        "third corpus document on bigram language model scoring today",
    ]
    for e, t in enumerate(texts):
        d.run_batch(_docs(spark, [t], e * 10), e)
    assert len(os.listdir(d.state_dir)) == 3
    d.compact_state(upto_epoch=2)
    assert [x for x in os.listdir(d.state_dir)
            if x.startswith("epoch=")] == ["epoch=2"]
    # a duplicate of epoch-0 content is still suppressed post-compaction
    d.run_batch(_docs(spark, [texts[0], "a genuinely new fourth doc "
                              "with fresh tokens entirely"], 100), 3)
    out_texts = sorted(r.text for r in d.output().collect())
    assert len(out_texts) == 4 and out_texts.count(texts[0]) == 1


def test_crash_between_output_and_state_heals_on_replay(spark, tmp_path):
    """Chaos: the process dies after epoch N's output lands but before
    its Bloom state persists.  The replay must regenerate BOTH from
    state(N-1) — no duplicate admissions, no lost state."""
    from ticdc_spark import failpoint
    from ticdc_spark.streaming.dedup import StreamingBloomDedup

    d = StreamingBloomDedup(spark, str(tmp_path))
    d.run_batch(_docs(spark, ["p", "q"]), 0)
    failpoint.enable("dedup/after-output", "1*error(crash)")
    try:
        with pytest.raises(RuntimeError):
            d.run_batch(_docs(spark, ["q", "r"], 10), 1)
        # epoch-1 output exists, epoch-1 state does NOT
        assert os.path.isdir(os.path.join(d.out_dir, "epoch=1"))
        assert not os.path.isdir(os.path.join(d.state_dir, "epoch=1"))
        # replay (foreachBatch redelivers the same epoch id)
        d.run_batch(_docs(spark, ["q", "r"], 10), 1)
    finally:
        failpoint.disable_all()
    texts = sorted(r.text for r in d.output().collect())
    assert texts == ["p", "q", "r"]
    # state is whole: a later duplicate of "r" is suppressed
    d.run_batch(_docs(spark, ["r", "s"], 20), 2)
    texts = sorted(r.text for r in d.output().collect())
    assert texts == ["p", "q", "r", "s"]
