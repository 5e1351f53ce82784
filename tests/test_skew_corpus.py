"""Skew-robustness evidence on deliberately-skewed corpora.

The 10x/30x/100x bench blocks and the sf1 sweep all draw keys
near-uniformly; these tests pin the skew GUARDS against the
distributions they exist for — a hot pk owning 20% of a changelog, a
power-law duplicate-cluster corpus — so "the salted fold equals the
naive fold" and "the LSH bucket cap bounds the quadratic cliff" are
tested facts, not design claims."""

from __future__ import annotations

from pyspark.sql import functions as F

from ticdc_spark.llm.dedup import minhash_lsh_hot_buckets, minhash_lsh_pairs
from ticdc_spark.llm.skew import powerlaw_documents, skewed_changelog
from ticdc_spark.operators.compaction import (
    compact_changelog,
    compact_changelog_salted,
)

SMALL_SPEC = ((200, 1), (20, 5))


def _set_equal(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_salted_compaction_equals_naive_on_hot_key(spark):
    cl = skewed_changelog(spark, n_rows=20_000, hot_frac=0.2)
    naive = compact_changelog(cl)
    salted = compact_changelog_salted(cl, n_salts=16)
    assert _set_equal(naive, salted)


def test_hot_key_fold_is_complete(spark):
    """The hot pk's fold must see every one of its events (a skew guard
    that silently drops hot-key rows would still pass a wall-clock
    probe)."""
    cl = skewed_changelog(spark, n_rows=20_000, hot_frac=0.2)
    expected = cl.filter((F.col("pk") == 0) & F.col("op").isin("I", "U", "D")).count()
    row = (
        compact_changelog_salted(cl, n_salts=16)
        .filter(F.col("pk") == 0)
        .select("n_events")
        .collect()
    )
    assert len(row) == 1 and row[0].n_events == expected
    assert expected >= 0.19 * 20_000  # the corpus really is skewed


def test_lsh_guard_bounds_hot_cluster(spark):
    docs = powerlaw_documents(spark, cluster_spec=SMALL_SPEC, n_singletons=100)
    guarded = minhash_lsh_pairs(docs)  # default max_bucket=64
    unguarded = minhash_lsh_pairs(docs, max_bucket=1 << 40)
    g = {(r.a_id, r.b_id) for r in guarded.select("a_id", "b_id").collect()}
    u = {(r.a_id, r.b_id) for r in unguarded.select("a_id", "b_id").collect()}
    # guard only ever drops candidates, never invents them
    assert g <= u
    # the viral 200-doc cluster's buckets exceed the cap: its quadratic
    # pair set (C(200,2)=19900) is present unguarded, absent guarded
    viral = {p for p in u if p[0] < 100_000 and p[1] < 100_000}
    assert len(viral) == 200 * 199 // 2
    assert not (g & viral)
    # the healthy 20-doc clusters survive the guard in full
    assert len(u - viral) == 5 * (20 * 19 // 2)
    assert g == u - viral
    # and the audit trail accounts for exactly the dropped buckets
    audit = minhash_lsh_hot_buckets(docs)
    assert audit.count() > 0
    assert audit.filter(F.col("occ") <= 64).count() == 0


def test_powerlaw_documents_deterministic(spark):
    a = powerlaw_documents(spark, cluster_spec=SMALL_SPEC, n_singletons=50)
    b = powerlaw_documents(spark, cluster_spec=SMALL_SPEC, n_singletons=50)
    assert _set_equal(a, b)
    assert a.count() == 200 + 5 * 20 + 50
