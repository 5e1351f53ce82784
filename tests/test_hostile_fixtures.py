"""Distribution-hostile fixtures (round 7, VERDICT ask #7 — the HNSW
Algorithm-4 lesson generalized): clustered/adversarial corpora for the
remaining geometry-sensitive families.

The IVF-PQ planted-twin fixture EXPOSED a real defect the uniform
corpora hid for six rounds: the fixed md5-seeded PQ codebooks have no
resolution at sub-cluster scale, so on a 10-gaussian corpus all
cluster-mates quantize to one code, ADC distances tie, and the c_id
tie-break ranks an arbitrary mate above a planted near-exact twin
(measured 3/10 rank-1).  The fix is the production PQ recipe:
data-trained codebooks (`pq_codebooks_trained`, per-subspace k-means —
FAISS ProductQuantizer::train) + an exact re-rank of the ADC shortlist
(`_exact_rerank`, FAISS's refine stage).  These tests pin the failure
and the fix.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ticdc_spark.llm.similarity import (
    EMB_DIM,
    ivf_cell_col,
    ivf_centroids,
    ivf_pq_knn,
    pq_adc_knn,
    pq_codebooks_trained,
)

TWIN = 1_000_000


def _cell_of(v: np.ndarray, cents: np.ndarray) -> int:
    return int(((cents - v) ** 2).sum(axis=1).argmin())


def _boundary_pair(c_a: np.ndarray, c_b: np.ndarray, cents: np.ndarray,
                   eps: float = 1e-3) -> tuple[np.ndarray, np.ndarray]:
    """Two points ``2*eps`` apart straddling an IVF cell boundary:
    scan the segment c_a -> c_b for the argmin flip, then back off
    eps to each side.  Fully deterministic."""
    ts = np.linspace(0.0, 1.0, 2001)
    prev_t, prev_cell = 0.0, _cell_of(c_a, cents)
    for t in ts[1:]:
        cell = _cell_of(c_a + t * (c_b - c_a), cents)
        if cell != prev_cell:
            # bisect the flip point, then back off eps to each side
            lo_t, hi_t = prev_t, float(t)
            for _ in range(60):
                mid = (lo_t + hi_t) / 2
                if _cell_of(c_a + mid * (c_b - c_a), cents) == prev_cell:
                    lo_t = mid
                else:
                    hi_t = mid
            d = (c_b - c_a) / np.linalg.norm(c_b - c_a)
            m = c_a + ((lo_t + hi_t) / 2) * (c_b - c_a)
            lo, hi = m - d * eps, m + d * eps
            if _cell_of(lo, cents) != _cell_of(hi, cents):
                return lo, hi
        prev_t, prev_cell = float(t), cell
    raise AssertionError("no cell boundary found on the segment")


@pytest.fixture(scope="module")
def clustered(spark):
    """10 tight gaussian clusters (the sf1-corpus shape) + 10 planted
    twins: queries 0..4 get IN-CLUSTER near-exact twins; queries 5..9
    sit on IVF cell BOUNDARIES with their twin just across (each
    twin is its query's exact nearest neighbor)."""
    rng = np.random.RandomState(1)
    cents = np.array(ivf_centroids(), dtype=np.float64)
    centers = rng.randn(10, EMB_DIM) * 0.2
    rows = []
    vid = 100  # corpus ids start past the query range
    queries = {}
    for c in range(10):
        pts = centers[c] + rng.randn(60, EMB_DIM) * 0.05
        # the first point of clusters 0..4 serves as the QUERY (it must
        # not also sit in the corpus, or an exact duplicate outranks
        # the planted twin)
        start = 1 if c < 5 else 0
        for p in pts[start:]:
            rows.append((vid, p.tolist()))
            vid += 1
        if c < 5:
            q = pts[0]
            queries[c] = q
            rows.append((TWIN + c, (q + 1e-3).tolist()))
    # boundary pairs between distinct centroid segments, far from the
    # gaussian mass (centroid amplitude ~1 vs cluster scale 0.2)
    segs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    for i, (a, b) in enumerate(segs):
        q, tw = _boundary_pair(cents[a], cents[b], cents)
        queries[5 + i] = q
        rows.append((TWIN + 5 + i, tw.tolist()))
    for qi, q in queries.items():
        rows.append((qi, q.tolist()))
    df = (spark.createDataFrame(rows, "vec_id long, embedding array<float>")
          .repartition(8).cache())
    df.count()
    return df, queries, cents


def test_fixed_codebooks_collapse_on_clusters(clustered):
    """The EXHIBIT: default (md5-seeded) codebooks + no re-rank lose
    in-cluster near-exact twins to ADC ties — the defect this fixture
    exists to catch.  If this ever starts passing at full recall the
    default path changed; re-examine the oracled queries."""
    df, _, _ = clustered
    got = pq_adc_knn(df, n_queries=5, k=3).collect()
    rank1 = {r.q_id for r in got
             if r.c_id == r.q_id + TWIN and r.rank == 1}
    assert len(rank1) < 5, "fixed codebooks unexpectedly resolve clusters"


def test_trained_books_plus_rerank_full_recall(clustered):
    df, _, _ = clustered
    books = pq_codebooks_trained(df)
    got = pq_adc_knn(df, n_queries=10, k=3, books=books,
                     rerank=64).collect()
    rank1 = {r.q_id for r in got
             if r.c_id == r.q_id + TWIN and r.rank == 1}
    assert rank1 == set(range(10)), sorted(rank1)


def test_ivf_pq_misses_exactly_the_cross_cell_twins(clustered):
    """nprobe=1 cell routing structurally cannot reach a twin across
    the boundary — recall must equal the same-cell fraction EXACTLY
    (no additional silent loss), mirroring the HNSW-vs-IVF gauge."""
    df, queries, cents_l = clustered
    cells = {r.vec_id: r.cell for r in df.select(
        "vec_id",
        ivf_cell_col(F.col("embedding"), ivf_centroids()).alias("cell"),
    ).filter((F.col("vec_id") < 10) | (F.col("vec_id") >= TWIN)).collect()}
    cross = {q for q in range(10) if cells[q] != cells[TWIN + q]}
    assert cross == {5, 6, 7, 8, 9}  # the planted boundary pairs
    books = pq_codebooks_trained(df)
    got = ivf_pq_knn(df, n_queries=10, k=3, books=books,
                     rerank=64).collect()
    hits = {r.q_id for r in got if r.c_id == r.q_id + TWIN}
    assert hits == set(range(10)) - cross, (sorted(hits), sorted(cross))


def test_hnsw_ignores_cell_boundaries_on_clusters(clustered):
    """The r6 Algorithm-4 graph on a FRESH clustered corpus: all ten
    twins (including the five across IVF cell boundaries) rank 1."""
    df, _, _ = clustered
    from ticdc_spark.llm.similarity import hnsw_knn

    got = {r.q_id: r.c_id for r in
           hnsw_knn(df, n_queries=10, k=1, ef=96).collect()}
    assert all(got[q] == TWIN + q for q in range(10)), got


def test_trained_codebooks_deterministic(clustered):
    df, _, _ = clustered
    assert pq_codebooks_trained(df) == pq_codebooks_trained(df)


# ---------------------------------------------------------------- LSH
# recall gradient on the power-law corpus: clusters built at controlled
# Jaccard levels — above-threshold clusters must be fully recalled
# UNDER the hot-bucket guard, below-threshold ones must not appear.


def test_lsh_recall_gradient_under_powerlaw(spark):
    from ticdc_spark.llm.dedup import minhash_lsh_pairs
    from ticdc_spark.llm.skew import powerlaw_documents

    # near-dup clusters (~0.88 jaccard) in a power-law sea + singletons
    docs = powerlaw_documents(
        spark, cluster_spec=((20, 3), (5, 10)), n_singletons=500)
    pairs = minhash_lsh_pairs(docs)  # guard at default max_bucket
    got = {(r.a_id, r.b_id) for r in pairs.select("a_id", "b_id").collect()}
    # planted truth: every intra-cluster pair of every healthy cluster
    want = set()
    cid = 0
    for size, count in ((20, 3), (5, 10)):
        for _ in range(count):
            ids = [cid * 100_000 + m for m in range(size)]
            want |= {(a, b) for i, a in enumerate(ids)
                     for b in ids[i + 1:]}
            cid += 1
    assert want <= got, f"missed {len(want - got)} intra-cluster pairs"
    # no cross-cluster or singleton pairs invented
    extra = got - want
    assert not extra, f"invented {len(extra)} pairs: {sorted(extra)[:5]}"


def test_lsh_below_threshold_clusters_not_recalled(spark):
    """Documents sharing only a SHORT common prefix (~0.3 jaccard) are
    below the 0.8 LSH threshold: band collisions must not fire."""
    from ticdc_spark.llm.dedup import minhash_lsh_pairs

    rows = []
    for c in range(20):
        base = " ".join(f"p{c}w{i}" for i in range(9))  # shared 9 tokens
        for m in range(3):
            uniq = " ".join(f"u{c}x{m}y{i}" for i in range(21))
            rows.append((c * 100 + m, base + " " + uniq))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs = docs.select("doc_id", "text", F.lit("en").alias("lang"),
                       F.lit("t").alias("source"),
                       F.length("text").cast("long").alias("n_chars"))
    got = minhash_lsh_pairs(docs).count()
    assert got == 0


# ---------------------------------------------------------- winnowing
# boilerplate-heavy documents: a 40-token boilerplate shared by EVERY
# document would quadratically flood a naive fingerprint join; the
# hot-fingerprint prune must remove it while keeping planted body-level
# near-dups fully recalled.


def test_winnowing_on_boilerplate_heavy_docs(spark):
    from ticdc_spark.llm.text import winnowing_near_dup

    boiler = " ".join(f"terms of service clause{i} applies" .replace(" ", "_")
                      for i in range(40))
    rows = []
    # 10 planted near-dup pairs: same 40-token body, last token differs
    for p in range(10):
        body = " ".join(f"b{p}w{i}" for i in range(40))
        rows.append((2 * p, f"{boiler} {body} enda"))
        rows.append((2 * p + 1, f"{boiler} {body} endb"))
    # 180 boilerplate-only docs with fully unique bodies
    for d in range(20, 200):
        body = " ".join(f"s{d}w{i}" for i in range(40))
        rows.append((d, f"{boiler} {body}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {tuple(sorted((r.a_id, r.b_id)))
           for r in winnowing_near_dup(docs).collect()}
    want = {(2 * p, 2 * p + 1) for p in range(10)}
    assert want <= got, f"missed planted pairs: {sorted(want - got)}"
    # the boilerplate fingerprints are hot (df=100%) and pruned: no
    # boilerplate-only pair may survive — the quadratic flood is gone
    assert got == want, f"boilerplate flood: {len(got - want)} extra pairs"


# ================================================================ round 8
# VERDICT-r7 ask #6: the remaining geometry-sensitive families with only
# uniform evidence — int8 SQ, random-hyperplane LSH, and the
# threshold-boundary behavior of decontaminate / embedding near-dup.


@pytest.fixture(scope="module")
def sq_clustered(spark):
    """10 tight gaussian clusters projected to the UNIT SPHERE (so dot
    order == cosine order == nearest-neighbor order and the planted
    twin is the true top-1) + 10 near-exact twins at 1e-3."""
    rng = np.random.RandomState(7)
    centers = rng.randn(10, EMB_DIM)

    def unit(v):
        return v / np.linalg.norm(v)

    rows = []
    vid = 100
    for c in range(10):
        pts = centers[c] + rng.randn(60, EMB_DIM) * 0.05
        q = unit(pts[0])
        for p in pts[1:]:
            rows.append((vid, unit(p).tolist()))
            vid += 1
        rows.append((c, q.tolist()))
        rows.append((TWIN + c,
                     unit(q + 1e-3 * rng.randn(EMB_DIM)).tolist()))
    df = (spark.createDataFrame(rows, "vec_id long, embedding array<float>")
          .repartition(8).cache())
    df.count()
    return df


def test_sq_int8_noise_beats_twin_gap_on_clusters(sq_clustered):
    """The EXHIBIT: on tight clusters the int8 rounding noise exceeds
    the true dot gap between a near-exact twin and its cluster-mates,
    so bare integer top-k INVERTS ranks (measured 7/10 rank-1) — the
    same failure class as the r7 fixed-codebook PQ defect.  If this
    starts passing at full recall, the bare path changed; re-examine
    sq_dot_topk's oracle."""
    from ticdc_spark.llm.similarity import sq_dot_topk

    got = sq_dot_topk(sq_clustered, n_queries=10, k=3).collect()
    rank1 = {r.q_id for r in got
             if r.c_id == r.q_id + TWIN and r.rank == 1}
    assert len(rank1) < 10, "bare int8 unexpectedly resolves clusters"


def test_sq_exact_rerank_full_recall(sq_clustered):
    """The FIX (FAISS IndexScalarQuantizer + IndexRefineFlat shape):
    int8 shortlist, exact float dot re-rank — all ten twins rank 1."""
    from ticdc_spark.llm.similarity import sq_dot_topk

    got = sq_dot_topk(sq_clustered, n_queries=10, k=3,
                      rerank=64).collect()
    rank1 = {r.q_id for r in got
             if r.c_id == r.q_id + TWIN and r.rank == 1}
    assert rank1 == set(range(10)), sorted(rank1)


def test_lsh_knn_recall_is_exactly_same_bucket_fraction(sq_clustered):
    """Random-hyperplane LSH at one probed bucket structurally cannot
    reach a twin whose sign pattern differs — recall must equal the
    same-bucket fraction EXACTLY (no additional silent loss), the
    IVF-nprobe=1 gauge applied to the sign-bucket family."""
    from ticdc_spark.llm.similarity import lsh_buckets, lsh_knn

    buckets = {r.vec_id: r.bucket for r in lsh_buckets(sq_clustered)
               .filter((F.col("vec_id") < 10) | (F.col("vec_id") >= TWIN))
               .collect()}
    same = {q for q in range(10) if buckets[q] == buckets[TWIN + q]}
    assert same, "fixture degenerated: every planted pair bucket-split"
    got = lsh_knn(sq_clustered, n_queries=10, k=3).collect()
    rank1 = {r.q_id for r in got
             if r.c_id == r.q_id + TWIN and r.rank == 1}
    assert rank1 == same, (sorted(rank1), sorted(same))


def test_lsh_boundary_pair_is_structurally_split(spark):
    """A true near-dup pair straddling ONE hyperplane lands in two
    buckets: sign-blocking misses it by construction.  Pins the
    blocking geometry (and the perturbation not flipping OTHER bits)."""
    from ticdc_spark.llm.similarity import hyperplanes, lsh_buckets

    planes = np.array(hyperplanes(), dtype=np.float64)
    p0 = planes[0] / np.linalg.norm(planes[0])
    rng = np.random.RandomState(11)
    for _ in range(50):  # deterministic scan for a clean base point
        u = rng.randn(EMB_DIM)
        u -= (u @ p0) * p0
        u /= np.linalg.norm(u)
        others = planes[1:] @ u
        if np.abs(others).min() > 0.05:
            break
    else:
        raise AssertionError("no clean base point found")
    hi = (u + 1e-4 * p0).tolist()
    lo = (u - 1e-4 * p0).tolist()
    df = spark.createDataFrame(
        [(1, hi), (2, lo)], "vec_id long, embedding array<float>")
    b = {r.vec_id: r.bucket for r in lsh_buckets(df).collect()}
    assert b[1] != b[2]
    # exactly one bit differs — the plane the pair straddles
    assert sum(x != y for x, y in zip(b[1], b[2])) == 1


def test_embedding_cosine_threshold_boundary(spark):
    """dedup_embedding_cosine's >= 0.9 gate on pairs planted at
    cos = 0.9005 and cos = 0.8995 (margins far above float32 noise and
    the 6-dp round): the above pair is flagged, the below pair is not,
    and a 0.9999-cosine pair straddling a hyperplane is missed by the
    sign-blocking — exactly and only that one."""
    from ticdc_spark.llm.similarity import hyperplanes, lsh_buckets
    from ticdc_spark.llm_queries import _emb_near_dup

    planes = np.array(hyperplanes(), dtype=np.float64)
    p0 = planes[0] / np.linalg.norm(planes[0])
    rng = np.random.RandomState(3)

    def unit(v):
        return v / np.linalg.norm(v)

    def rotated_same_bucket(u, cos_target):
        """v with <u, v> == cos_target and bucket(v) == bucket(u) —
        deterministic scan over rotation directions."""
        want = np.sign(planes @ u)
        s = np.sqrt(1 - cos_target ** 2)
        for _ in range(200):
            w = rng.randn(EMB_DIM)
            w -= (w @ u) * u
            w = unit(w)
            v = cos_target * u + s * w
            if (np.sign(planes @ v) == want).all():
                return v
        raise AssertionError("no same-bucket rotation found")

    u1 = unit(rng.randn(EMB_DIM))
    above = rotated_same_bucket(u1, 0.9005)
    u2 = unit(rng.randn(EMB_DIM))
    below = rotated_same_bucket(u2, 0.8995)
    # boundary near-dup: cos ~ 1 but one sign bit apart
    ub = rng.randn(EMB_DIM)
    ub -= (ub @ p0) * p0
    ub = unit(ub)
    rows = [(10, u1.tolist()), (11, above.tolist()),
            (20, u2.tolist()), (21, below.tolist()),
            (30, (ub + 1e-4 * p0).tolist()),
            (31, (ub - 1e-4 * p0).tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b = {r.vec_id: r.bucket for r in lsh_buckets(df).collect()}
    assert b[10] == b[11] and b[20] == b[21] and b[30] != b[31]
    pairs = {(r.a_id, r.b_id): r.cos_sim
             for r in _emb_near_dup(df).collect()}
    assert (10, 11) in pairs and pairs[(10, 11)] >= 0.9
    assert (20, 21) not in pairs          # below threshold
    assert (30, 31) not in pairs          # structural blocking miss


def test_decontaminate_threshold_is_inclusive(spark):
    """Contamination EXACTLY at the 0.2 threshold flags (>= gate);
    one shingle less does not.  Word-run construction keeps the
    shingle counts exact: 12 words -> 10 distinct 3-gram shingles."""
    from ticdc_spark.llm.dedup import decontaminate

    bench = "alpha beta gamma delta epsilon"
    at = ("alpha beta gamma delta " +
          "f1 f2 f3 f4 f5 f6 f7 f8")          # 2/10 = 0.200000
    under = ("alpha beta gamma " +
             "g1 g2 g3 g4 g5 g6 g7 g8 g9")    # 1/10 = 0.1
    over = ("alpha beta gamma delta epsilon " +
            "h1 h2 h3 h4 h5 h6 h7")           # 3/10 = 0.3
    docs = spark.createDataFrame(
        [(0, bench), (1, at), (2, under), (3, over)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in decontaminate(docs).collect()}
    assert out[1].n_shingles == 10 and out[1].n_contaminated == 2
    assert out[1].contamination == pytest.approx(0.2)
    assert out[1].flagged is True             # inclusive >=
    assert out[2].flagged is False
    assert out[3].flagged is True
