"""Hot-bucket skew guard for minhash_lsh_pairs.

A boilerplate mega-cluster (many documents sharing every band hash)
must not reach the band-bucket self-join: occupancy above
MAX_BUCKET_OCCUPANCY is dropped before pair generation, and the
dropped keys are reported by minhash_lsh_hot_buckets for recall
accounting.  Reference behaviour anchor: the unguarded join is
quadratic per bucket — the guard bounds any single (band, bucket)
shuffle key to max_bucket²/2 pairs.
"""

from __future__ import annotations

from ticdc_spark.llm.dedup import (
    MAX_BUCKET_OCCUPANCY,
    N_BANDS,
    minhash_lsh_hot_buckets,
    minhash_lsh_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_mega_cluster_dropped(spark):
    # 80 identical docs (> cap of 64) + one genuine near-dup pair.
    boiler = [(i, "the same boilerplate footer text repeated verbatim "
                  "across every page of the crawl " * 3) for i in range(80)]
    pair = [
        (1000, "a unique long document about distributed query engines "
               "and shuffle partitioning strategies in apache spark"),
        (1001, "a unique long document about distributed query engines "
               "and shuffle partitioning strategy in apache spark"),
    ]
    docs = _docs(spark, boiler + pair)

    hot = minhash_lsh_hot_buckets(docs).collect()
    # the identical docs share every band -> all N_BANDS buckets are hot
    assert len(hot) == N_BANDS
    assert all(r.occ == 80 for r in hot)
    assert all(r.dropped_pairs == 80 * 79 // 2 for r in hot)

    pairs = minhash_lsh_pairs(docs, threshold=0.6).collect()
    ids = {(r.a_id, r.b_id) for r in pairs}
    # mega-cluster pairs are gone; the genuine near-dup pair survives
    assert (1000, 1001) in ids
    assert all(a >= 1000 for a, _ in ids)


def test_guard_noop_below_cap(spark):
    # cluster size exactly at the cap -> untouched, all pairs emitted
    n = MAX_BUCKET_OCCUPANCY
    docs = _docs(spark, [(i, "identical content " * 10) for i in range(n)])
    assert minhash_lsh_hot_buckets(docs).count() == 0
    assert minhash_lsh_pairs(docs).count() == n * (n - 1) // 2
