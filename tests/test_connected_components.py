"""Large-star/small-star CC: converges in O(log n) rounds, so a deep
chain (worst case for plain min-label propagation, which needs
O(diameter) rounds) must resolve well within a log2-sized iteration
budget."""

from __future__ import annotations

from ticdc_spark.llm.dedup import connected_components_star


def _labels(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


def test_deep_chain_converges_in_log_rounds(spark):
    # chain 0-1-2-...-63: diameter 63, log2(n)=6; 8 rounds must suffice
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id long, b_id long"
    )
    got = _labels(connected_components_star(pairs, max_iter=8))
    assert got == {i: 0 for i in range(n)}


def test_multiple_components_and_star_shapes(spark):
    # two stars + one triangle + an isolated pair, shuffled orientations
    edges = (
        [(10, i) for i in (11, 12, 13)]          # star around 10
        + [(25, 20), (20, 24), (23, 20)]          # star around 20
        + [(31, 30), (32, 31), (30, 32)]          # triangle
        + [(41, 40)]                              # pair
    )
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    got = _labels(connected_components_star(pairs, max_iter=8))
    want = {10: 10, 11: 10, 12: 10, 13: 10,
            20: 20, 23: 20, 24: 20, 25: 20,
            30: 30, 31: 30, 32: 30,
            40: 40, 41: 40}
    assert got == want


def test_empty_pair_graph(spark):
    pairs = spark.createDataFrame([], "a_id long, b_id long")
    assert connected_components_star(pairs).count() == 0
