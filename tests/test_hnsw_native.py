"""Native HNSW kernel: exact differential equivalence vs the Python
reference graph.

The C kernel is a line-by-line port of ``_HnswGraph`` with plain-loop
double arithmetic; graph decisions can only diverge from the numpy
path on sub-ulp distance ties, which these corpora (uniform, clustered
10-gaussian, planted near-exact twins, and the real parquet embeddings)
do not contain — so the pin here is EXACT: identical adjacency at every
level and identical search results after the 6-decimal rounding the
engine itself applies before any value leaves the executor.
"""

from __future__ import annotations

import numpy as np
import pytest

from ticdc_spark.llm import hnsw_native
from ticdc_spark.llm.similarity import (HNSW_EF_BUILD, HNSW_M, _HnswGraph,
                                        _hnsw_level)

pytestmark = pytest.mark.skipif(
    hnsw_native.LIB is None, reason="no C compiler / native kernel disabled")


def _assert_equivalent(ids, vecs, n_queries=10, seed=3):
    vecs = np.asarray(vecs, dtype=np.float64)
    levels = [_hnsw_level(i) for i in ids]
    gp = _HnswGraph(ids, vecs)
    gn = hnsw_native.NativeHnsw(ids, vecs, levels, HNSW_M, HNSW_EF_BUILD)
    # adjacency: identical neighbor lists (same order) at every level
    assert gn.n_levels == len(gp.edges)
    for lvl in range(len(gp.edges)):
        for node in range(len(ids)):
            py = gp.edges[lvl].get(node)
            nat = gn.neighbors(lvl, node)
            if py is None:
                assert nat is None or nat == []
            else:
                assert nat == py, (lvl, node)
    # search: identical (rounded d2, id) sequences, the engine's emit unit
    rng = np.random.RandomState(seed)
    for _ in range(n_queries):
        q = rng.randn(vecs.shape[1])
        rp = [(round(d, 6), i) for d, i in gp.search(q, 67, 64)]
        rn = [(round(d, 6), i) for d, i in gn.search(q, 67, 64)]
        assert rp == rn
    # member-vector queries too (the planted-twin shape)
    for i in range(0, len(ids), max(1, len(ids) // 5)):
        rp = [(round(d, 6), c) for d, c in gp.search(vecs[i], 67, 64)]
        rn = [(round(d, 6), c) for d, c in gn.search(vecs[i], 67, 64)]
        assert rp == rn


def test_uniform_corpus_identical():
    rng = np.random.RandomState(7)
    _assert_equivalent(list(range(400)), rng.randn(400, 64))


def test_clustered_corpus_identical():
    """10 tight gaussians — the geometry that exposed the r6/r7 ANN
    bugs; sub-cluster ties are where a divergence would hide."""
    rng = np.random.RandomState(11)
    cents = rng.randn(10, 64) * 5
    vecs = np.vstack([cents[i % 10] + 0.05 * rng.randn(64)
                      for i in range(600)])
    _assert_equivalent(list(range(600)), vecs)


def test_planted_twins_identical():
    """Near-exact twins with the non-contiguous +1000000 id convention."""
    rng = np.random.RandomState(13)
    base = rng.randn(300, 64)
    ids = list(range(300)) + [1000000 + i for i in range(10)]
    vecs = np.vstack([base, base[:10] * 1.001 + 0.0001])
    _assert_equivalent(ids, vecs)


def test_real_embeddings_identical():
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    ids = [int(x) for x in t.column("vec_id").to_pylist()]
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    _assert_equivalent(ids, vecs)


def test_kill_switch_and_fallback(monkeypatch):
    """try_build honors the unavailable-kernel contract."""
    monkeypatch.setattr(hnsw_native, "LIB", None)
    assert hnsw_native.try_build([1], np.zeros((1, 4)), [0], 8, 64) is None


def test_single_node_graph():
    g = hnsw_native.NativeHnsw([42], np.ones((1, 8)), [_hnsw_level(42)],
                               HNSW_M, HNSW_EF_BUILD)
    res = g.search(np.ones(8), 3, 8)
    assert res == [(0.0, 42)]
