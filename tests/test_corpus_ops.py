"""Corpus-operator tests (`llm/corpus.py`): Bloom membership semantics,
mixture-weight integer identities, bigram-LM sanity, classifier
threshold algebra.  Oracle parity itself is covered by the registry
sweep in test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ticdc_spark.llm.corpus import (
    BLOOM_K,
    BLOOM_WORDS,
    QC_THRESHOLD_MILLI,
    bigram_logprob,
    bloom_build,
    bloom_probe,
    mixture_weights,
    quality_classifier,
)
from ticdc_spark.sources.changelog import read_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_bloom_no_false_negatives(spark, docs):
    """Every inserted key MUST hit — the Bloom contract."""
    keys = docs.select(F.md5("text").alias("key")).distinct()
    bloom = bloom_build(keys)
    probed = bloom_probe(keys, bloom)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_bloom_absent_keys_mostly_miss(spark, docs):
    """Absent probes mostly miss; the FP rate stays far below 50%
    (sized ~8 bits/key, k=4 → a few percent)."""
    bloom = bloom_build(docs.select(F.md5("text").alias("key")))
    absent = spark.range(500).select(
        F.concat(F.lit("never-inserted:"), F.col("id")).alias("key")
    )
    hits = bloom_probe(absent, bloom).filter("bloom_hit").count()
    assert hits < 50  # <10% observed; generous bound against unlucky seeds


def test_bloom_table_is_tiny(spark, docs):
    """The build output is bounded by the word count regardless of input
    size — the property that makes it broadcastable at any corpus SF."""
    bloom = bloom_build(docs.select(F.md5("text").alias("key")))
    assert bloom.count() <= BLOOM_WORDS


def test_bloom_merge_associative(spark, docs):
    """Build over A∪B == wordwise-OR of build(A), build(B) — partial
    (map-side / per-batch) aggregation is sound."""
    a = docs.filter("doc_id % 2 = 0").select(F.md5("text").alias("key"))
    b = docs.filter("doc_id % 2 = 1").select(F.md5("text").alias("key"))
    merged = (
        bloom_build(a).unionByName(bloom_build(b))
        .groupBy("word_idx").agg(F.expr("bit_or(word)").alias("word"))
    )
    whole = bloom_build(a.unionByName(b))
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_mixture_weights_identities(spark, docs):
    rows = mixture_weights(docs).collect()
    assert len(rows) == docs.select("source").distinct().count()
    # ppm weights sum to ~1e6 (truncation loses < n_sources ppm)
    total_ppm = sum(r.weight_ppm for r in rows)
    assert 1_000_000 - len(rows) <= total_ppm <= 1_000_000
    # sqrt temperature flattens: max/min ppm ratio must be well below
    # the max/min token ratio
    toks = sorted(r.n_tokens for r in rows)
    ppms = sorted(r.weight_ppm for r in rows)
    assert ppms[-1] / ppms[0] < toks[-1] / toks[0]
    for r in rows:
        assert r.alloc_tokens == r.weight_ppm * 10_000_000 // 1_000_000
        assert r.epochs_milli == r.alloc_tokens * 1000 // r.n_tokens


def test_bigram_logprob_shape(spark, docs):
    out = bigram_logprob(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows[:50]:
        assert r.n_bigrams >= 1
        assert r.logprob_micro < 0  # log-probs are negative


def test_bigram_more_tokens_lower_logprob(spark, docs):
    """Total (unnormalised) logprob decreases with length — a basic
    monotonicity sanity on the fold."""
    joined = (
        bigram_logprob(docs)
        .join(docs.select("doc_id", F.size(F.split("text", " "))
                          .alias("n_toks")), "doc_id")
        .collect()
    )
    big = [r for r in joined if r.n_toks >= 150]
    small = [r for r in joined if r.n_toks <= 30]
    if big and small:
        avg = lambda rs: sum(r.logprob_micro for r in rs) / len(rs)  # noqa: E731
        assert avg(big) < avg(small)


def test_quality_classifier_threshold_algebra(spark, docs):
    rows = quality_classifier(docs).collect()
    for r in rows:
        assert r.keep == (r.score_milli > r.n_toks * QC_THRESHOLD_MILLI)
    # both classes populated: the deterministic weights are centered
    # near 0, so the 0.05 threshold splits the corpus
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows)


def test_corpus_plan_budgets(spark, sf_dir):
    """Shuffle budgets: bloom pays build-groupBy + probe-groupBy + the
    candidate joins; mixture is source-agg + global-total agg; bigram
    pays the two count tables and the per-doc fold (AQE fuses the
    rest); the classifier is a single groupBy."""
    from ticdc_spark.queries import QUERIES

    budgets = [
        ("bloom_membership", 4),
        ("mixture_weights", 3),
        ("bigram_logprob", 5),
        ("quality_classifier", 1),
    ]
    for name, budget in budgets:
        df = QUERIES[name](spark, sf_dir)
        p = df._jdf.queryExecution().executedPlan().toString()
        shuffles = p.count("Exchange") - p.count("BroadcastExchange")
        assert shuffles <= budget, f"{name}: {shuffles} > {budget}\n{p}"
        if name == "bloom_membership":
            # the bit table must go broadcast, never shuffled
            assert "BroadcastExchange" in p


def test_bpe_train_merges_boundary_safety(spark):
    """A merged symbol must not fuse with a neighbor via substring
    overlap: after (c,a) merges, word 'cab' is [ca, b] and must still
    produce pair (ca,b) — a plain unanchored replace would have fused
    'c'+'ab' or left corrupted symbol states."""
    from ticdc_spark.llm.text import bpe_train_merges

    text = " ".join(["ca"] * 100 + ["ab"] * 90 + ["cab"])
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {r["step"]: r for r in bpe_train_merges(docs, k=3).collect()}
    assert (out[0]["left"], out[0]["right"], out[0]["pair_count"]) == \
        ("c", "a", 101)
    assert (out[1]["left"], out[1]["right"], out[1]["pair_count"]) == \
        ("a", "b", 90)
    # 'cab' survived as [ca, b]; a boundary-broken merge would have
    # destroyed this pair
    assert (out[2]["left"], out[2]["right"], out[2]["pair_count"]) == \
        ("ca", "b", 1)


def test_bpe_train_merges_consecutive_merges_in_one_word(spark):
    """'a a a a' must become 'aa aa' after merging (a,a) — the
    leftmost non-overlapping semantics of the reference algorithm."""
    from ticdc_spark.llm.text import bpe_train_merges

    docs = spark.createDataFrame(
        [(1, " ".join(["aaaa"] * 5))], "doc_id long, text string")
    out = {r["step"]: r for r in bpe_train_merges(docs, k=2).collect()}
    # step0: word [a,a,a,a] has 3 adjacent (a,a) pairs x5 copies
    assert (out[0]["left"], out[0]["right"], out[0]["pair_count"]) == \
        ("a", "a", 15)
    # after merge: [aa, aa] -> pair (aa,aa) x5
    assert (out[1]["left"], out[1]["right"], out[1]["pair_count"]) == \
        ("aa", "aa", 5)


def test_winnowing_shared_substring_guarantee(spark):
    """Schleimer et al. §2: any shared run of >= k+w-1 tokens (8 here)
    yields at least one shared fingerprint; disjoint texts share none
    (whp)."""
    from ticdc_spark.llm.text import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"one two three {shared} four five six seven"),
        (2, f"{shared} nine ten eleven twelve thirteen fourteen"),
        (3, "aa bb cc dd ee ff gg hh ii jj kk ll"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: set(r["fingerprints"])
           for r in winnowing_fingerprints(df).collect()}
    assert out[1] & out[2], "shared 8-token run must share a fingerprint"
    assert not (out[1] & out[3])
    # short docs (< k+w-1 grams... < 8 tokens) are excluded entirely
    short = spark.createDataFrame([(9, "a b c d e f g")],
                                  "doc_id long, text string")
    assert winnowing_fingerprints(short).count() == 0
