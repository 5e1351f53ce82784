"""Unigram language-model tokenizer (SentencePiece-style), distributed.

Kudo 2018 ("Subword Regularization") trains a unigram LM over subword
pieces with EM: seed a large candidate vocabulary from frequent
substrings, alternate (E) segmenting the corpus under current piece
probabilities with (M) re-estimating probabilities from segment counts,
then prune low-probability pieces toward the target vocabulary size.
This implementation uses hard (Viterbi) EM — the standard approximation;
the Viterbi objective is monotonically non-decreasing and is asserted so
in tests, alongside an exhaustive-enumeration optimality check of the
segmenter.

Scale shape: the corpus-sized work is ONE word-count aggregation; every
EM iteration runs over the DISTINCT-WORD table (vocabulary-sized) with
an Arrow-batched Viterbi kernel, piece counts reduced by one shuffle per
iteration, and the (bounded, e.g. ≤4k-piece) vocabulary collected to the
driver between steps — the trainer precedent (bpe_train_merges,
ivf_kmeans_train). Counts stay int64 end to end, so training is
deterministic and integer-exact; probabilities are derived (count,
total) pairs, never summed as floats across partitions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# log-prob penalty for a character absent from the vocabulary (coverage
# fallback — single chars are never pruned, so this only fires for chars
# unseen at train time)
UNK_PENALTY = -20.0


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> distinct (w, n) word-count table; the only corpus-sized
    stage of training."""
    return (
        docs.select(F.explode(F.split(F.lower(text_col), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    )


def seed_pieces(wc: DataFrame, max_piece_len: int = 4, seed_size: int = 512) -> DataFrame:
    """Candidate vocabulary: every single character, plus the
    ``seed_size`` most frequent multi-character substrings (length ≤
    ``max_piece_len``), counts weighted by word frequency. All JVM-side:
    two sequence explodes + substring."""
    pos = wc.select(
        "w", "n", F.length("w").alias("len"),
        F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i"),
    )
    subs = pos.select(
        "w", "n",
        F.explode(F.sequence(
            F.lit(1), F.least(F.lit(max_piece_len), F.col("len") - F.col("i") + 1)
        )).alias("l"),
        "i",
    ).select(F.expr("substring(w, i, l)").alias("piece"), "n")
    counts = subs.groupBy("piece").agg(F.sum("n").alias("count"))
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.col("count").desc(), "piece")
        .limit(seed_size)
    )
    return chars.unionByName(multi)


# ---------------------------------------------------------------- viterbi


def viterbi_segment(word: str, logp: dict[str, float], max_piece_len: int) -> tuple[list[str], float]:
    """Best segmentation of ``word`` under piece log-probs; unseen single
    chars are allowed at UNK_PENALTY (coverage). Ties break toward the
    FEWER-pieces path then lexicographically earlier piece boundaries —
    deterministic on any engine."""
    n = len(word)
    best = [(-math.inf, 0)] * (n + 1)  # (score, n_pieces)
    best[0] = (0.0, 0)
    back: list[int] = [0] * (n + 1)
    for j in range(1, n + 1):
        b_score, b_pieces, b_i = -math.inf, 0, -1
        for i in range(max(0, j - max_piece_len), j):
            if best[i][0] == -math.inf:
                continue
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i > 1:
                    continue
                lp = UNK_PENALTY
            cand = (best[i][0] + lp, best[i][1] + 1)
            # higher score wins; tie -> fewer pieces -> longer last piece
            if (cand[0] > b_score + 1e-12
                    or (abs(cand[0] - b_score) <= 1e-12
                        and (cand[1] < b_pieces
                             or (cand[1] == b_pieces and i < b_i)))):
                b_score, b_pieces, b_i = cand[0], cand[1], i
        best[j] = (b_score, b_pieces)
        back[j] = b_i
    pieces = []
    j = n
    while j > 0:
        i = back[j]
        pieces.append(word[i:j])
        j = i
    pieces.reverse()
    return pieces, best[n][0]


def _logp_from_counts(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    return {p: math.log(c) - math.log(total) for p, c in counts.items() if c > 0}


# ---------------------------------------------------------------- trainer


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 256,
    n_iters: int = 3,
    max_piece_len: int = 4,
    seed_size: int = 512,
    prune_frac: float = 0.25,
    text_col: str = "text",
    em_mode: str = "viterbi",
) -> tuple[list[tuple[str, int]], list[float]]:
    """Train; returns (vocab as [(piece, count)] sorted by (-count, piece),
    per-iteration objectives). Runs jobs at call time (trainer).

    ``em_mode``: "viterbi" (hard EM — counts from the best segmentation,
    objective = Viterbi log-score) or "full" (true EM — forward-backward
    expected counts in int64 fixed-point grains, objective = marginal
    log-likelihood, SentencePiece's actual E-step).  Full mode keeps the
    same distributed shape: one Arrow pass over the distinct-word table
    per iteration, codebook-only collects."""
    if em_mode not in ("viterbi", "full"):
        raise ValueError(f"unknown em_mode {em_mode!r}")
    spark = docs.sparkSession
    wc = word_counts(docs, text_col).cache()
    seed = {r["piece"]: int(r["count"]) for r in seed_pieces(
        wc, max_piece_len, seed_size).collect()}
    counts = dict(seed)
    objectives: list[float] = []

    def em_pass(cur_counts: dict[str, int]) -> tuple[dict[str, int], float]:
        logp = _logp_from_counts(cur_counts)
        b_logp = spark.sparkContext.broadcast(logp)
        mpl = max_piece_len

        def kernel(batches):
            import pandas as pd

            lp = b_logp.value
            for pdf in batches:
                acc: dict[str, int] = {}
                obj = 0.0
                for w, n in zip(pdf["w"], pdf["n"]):
                    pieces, score = viterbi_segment(w, lp, mpl)
                    obj += score * int(n)
                    for p in pieces:
                        acc[p] = acc.get(p, 0) + int(n)
                out = pd.DataFrame(
                    {"piece": list(acc) + ["\x00obj"],
                     "cnt": list(acc.values()) + [0],
                     "obj": [0.0] * len(acc) + [obj]})
                yield out

        agg = (
            wc.mapInPandas(kernel, "piece string, cnt long, obj double")
            .groupBy("piece").agg(F.sum("cnt").alias("cnt"),
                                  F.sum("obj").alias("obj"))
        ).collect()
        new_counts: dict[str, int] = {}
        objective = 0.0
        for r in agg:
            if r["piece"] == "\x00obj":
                objective = r["obj"]
            elif r["cnt"] > 0:
                new_counts[r["piece"]] = int(r["cnt"])
        # coverage: single chars survive even with zero Viterbi usage
        for p, c in seed.items():
            if len(p) == 1 and p not in new_counts:
                new_counts[p] = 1
        return new_counts, objective

    def one_pass(cur):
        if em_mode == "full":
            new_counts, ll = em_full_pass(wc, cur, max_piece_len)
            # coverage: single chars survive even at zero expectation
            for p in seed:
                if len(p) == 1 and p not in new_counts:
                    new_counts[p] = 1
            return new_counts, ll
        return em_pass(cur)

    while True:
        for _ in range(n_iters):
            counts, obj = one_pass(counts)
            objectives.append(obj)
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (pc[1], pc[0]))
        n_chars = sum(1 for p in counts if len(p) == 1)
        target_multi = max(0, vocab_size - n_chars)
        if len(multi) <= target_multi:
            break
        # prune the weakest quarter (never below the target), then re-EM
        n_drop = min(len(multi) - target_multi,
                     max(1, int(len(multi) * prune_frac)))
        for p, _ in multi[:n_drop]:
            del counts[p]
    vocab = sorted(counts.items(), key=lambda pc: (-pc[1], pc[0]))
    return vocab, objectives


# ---------------------------------------------------------------- tokenizer


def tokenize_stats(
    docs: DataFrame, vocab: list[tuple[str, int]],
    max_piece_len: int = 4, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Per-document segmentation stats under a trained vocab:
    (doc_id, n_words, n_pieces, n_unk_chars) — integer-exact."""
    logp = _logp_from_counts(dict(vocab))
    spark = docs.sparkSession
    b_logp = spark.sparkContext.broadcast(logp)
    mpl = max_piece_len

    def kernel(batches):
        import pandas as pd

        lp = b_logp.value
        for pdf in batches:
            rows = {"doc_id": [], "n_words": [], "n_pieces": [], "n_unk_chars": []}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in str(text).lower().split() if w]
                n_pieces = 0
                n_unk = 0
                for w in words:
                    pieces, _ = viterbi_segment(w, lp, mpl)
                    n_pieces += len(pieces)
                    n_unk += sum(1 for p in pieces if p not in lp)
                rows["doc_id"].append(did)
                rows["n_words"].append(len(words))
                rows["n_pieces"].append(n_pieces)
                rows["n_unk_chars"].append(n_unk)
            yield pd.DataFrame(rows)

    return docs.select(id_col, text_col).mapInPandas(
        kernel, "doc_id long, n_words long, n_pieces long, n_unk_chars long")


# ---------------------------------------------------------------- full EM

FIXED_POINT = 1_000_000  # expected counts quantize to 1e-6 grains (int64)


def forward_backward(word: str, logp: dict[str, float], max_piece_len: int):
    """Expected piece counts over the FULL segmentation lattice (true EM
    E-step, Kudo 2018 §3.2) plus the word's marginal log-likelihood.
    Unseen single chars participate at UNK_PENALTY like the Viterbi path."""
    n = len(word)
    NEG = -math.inf

    def lp_of(i: int, j: int):
        piece = word[i:j]
        v = logp.get(piece)
        if v is None and j - i == 1:
            return piece, UNK_PENALTY
        return piece, v

    def lse(a: float, b: float) -> float:
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = a if a > b else b
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            if alpha[i] == NEG:
                continue
            _, lp = lp_of(i, j)
            if lp is not None:
                alpha[j] = lse(alpha[j], alpha[i] + lp)
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            if beta[j] == NEG:
                continue
            _, lp = lp_of(i, j)
            if lp is not None:
                beta[i] = lse(beta[i], lp + beta[j])
    z = alpha[n]
    expected: dict[str, float] = {}
    if z == NEG:
        return expected, NEG
    for i in range(n):
        if alpha[i] == NEG:
            continue
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            if beta[j] == NEG:
                continue
            piece, lp = lp_of(i, j)
            if lp is None:
                continue
            post = math.exp(alpha[i] + lp + beta[j] - z)
            if post > 0:
                expected[piece] = expected.get(piece, 0.0) + post
    return expected, z


def em_full_pass(wc: DataFrame, counts: dict[str, int | float],
                 max_piece_len: int = 4) -> tuple[dict[str, int], float]:
    """One full-EM pass over the distinct-word table: expected counts
    accumulate as FIXED-POINT int64 (1e-6 grains), so the shuffle sum is
    order-independent and training stays run-to-run deterministic; the
    marginal log-likelihood likewise rides a fixed-point column."""
    spark = wc.sparkSession
    logp = _logp_from_counts({p: c for p, c in counts.items() if c > 0})
    b_logp = spark.sparkContext.broadcast(logp)
    mpl = max_piece_len

    def kernel(batches):
        import pandas as pd

        lp = b_logp.value
        for pdf in batches:
            acc: dict[str, int] = {}
            ll_fp = 0
            for w, n in zip(pdf["w"], pdf["n"]):
                expected, z = forward_backward(w, lp, mpl)
                if z == -math.inf:
                    continue
                ll_fp += round(z * int(n) * FIXED_POINT)
                for piece, e in expected.items():
                    acc[piece] = acc.get(piece, 0) + round(e * int(n) * FIXED_POINT)
            out = pd.DataFrame(
                {"piece": list(acc) + ["\x00ll"],
                 "cnt_fp": list(acc.values()) + [ll_fp]})
            yield out

    agg = (
        wc.mapInPandas(kernel, "piece string, cnt_fp long")
        .groupBy("piece").agg(F.sum("cnt_fp").alias("cnt_fp"))
    ).collect()
    new_counts: dict[str, int] = {}
    loglik = 0.0
    for r in agg:
        if r["piece"] == "\x00ll":
            loglik = r["cnt_fp"] / FIXED_POINT
        elif r["cnt_fp"] > 0:
            new_counts[r["piece"]] = int(r["cnt_fp"])  # fixed-point grains
    return new_counts, loglik
