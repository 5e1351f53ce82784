"""Unigram LM tokenizer: Viterbi optimality (exhaustive), EM monotonicity,
pruning, coverage, and end-to-end learning of a planted piece."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from ticdc_spark.llm.unigram import (
    UNK_PENALTY,
    _logp_from_counts,
    seed_pieces,
    tokenize_stats,
    train_unigram,
    viterbi_segment,
    word_counts,
)


def _brute_force_best(word: str, logp: dict, max_len: int) -> float:
    """Enumerate EVERY segmentation (compositions of len(word)) and score
    it — the exhaustive oracle for the Viterbi kernel."""
    n = len(word)
    best = -math.inf
    for cuts in itertools.product([0, 1], repeat=n - 1):
        bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        score = 0.0
        ok = True
        for a, b in zip(bounds, bounds[1:]):
            if b - a > max_len:
                ok = False
                break
            piece = word[a:b]
            lp = logp.get(piece)
            if lp is None:
                if b - a > 1:
                    ok = False
                    break
                lp = UNK_PENALTY
            score += lp
        if ok:
            best = max(best, score)
    return best


def test_viterbi_matches_exhaustive_enumeration():
    logp = _logp_from_counts({
        "a": 10, "b": 8, "c": 3, "ab": 6, "bc": 4, "abc": 2, "cab": 1, "aa": 5})
    for word in ["a", "abc", "abcabc", "aaab", "cabbc", "xyz", "axbyc",
                 "aaaaaaa", "abcbcab"]:
        pieces, score = viterbi_segment(word, logp, max_piece_len=3)
        assert "".join(pieces) == word
        assert score == pytest.approx(_brute_force_best(word, logp, 3), abs=1e-9)


def test_viterbi_coverage_and_unk():
    logp = _logp_from_counts({"a": 1})
    pieces, score = viterbi_segment("azz", logp, 4)
    assert "".join(pieces) == "azz"
    assert score == pytest.approx(logp["a"] + 2 * UNK_PENALTY)


def test_seed_pieces_counts(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab cd"), (2, "ab")], "doc_id long, text string")
    wc = word_counts(docs)
    seed = {r["piece"]: r["count"] for r in seed_pieces(wc, 2, 10).collect()}
    # "ab" appears in 3 word instances; chars a/b likewise; c/d once
    assert seed["ab"] == 3 and seed["a"] == 3 and seed["c"] == 1
    assert seed["cd"] == 1


def test_train_learns_planted_piece_and_em_monotone(spark):
    rows = [(i, "tok" + ("en " * 3) + "token token zzq") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab, objectives = train_unigram(
        docs, vocab_size=24, n_iters=3, max_piece_len=4, seed_size=64)
    # hard-EM Viterbi objective is non-decreasing within an EM block
    for a, b in zip(objectives[:2], objectives[1:3]):
        assert b >= a - 1e-6
    pieces = dict(vocab)
    # the planted high-frequency subword survives pruning with top count
    assert "toke" in pieces or "tok" in pieces
    multi = [p for p in pieces if len(p) > 1]
    n_chars = sum(1 for p in pieces if len(p) == 1)
    assert len(multi) + n_chars <= 24 or len(multi) == 0
    # single-char coverage never pruned
    for ch in "tokenzq":
        assert ch in pieces


def test_tokenize_stats_integer_exact(spark):
    docs = spark.createDataFrame(
        [(1, "abab ab"), (2, "xy")], "doc_id long, text string")
    vocab = [("ab", 10), ("a", 5), ("b", 5), ("x", 1), ("y", 1)]
    out = {r["doc_id"]: r for r in
           tokenize_stats(docs, vocab, max_piece_len=2).collect()}
    assert out[1]["n_words"] == 2
    assert out[1]["n_pieces"] == 3  # ab+ab, ab
    assert out[1]["n_unk_chars"] == 0
    assert out[2]["n_pieces"] == 2 and out[2]["n_unk_chars"] == 0


def test_train_deterministic_across_runs(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma alphabeta") for i in range(20)],
        "doc_id long, text string")
    v1, o1 = train_unigram(docs, vocab_size=32, n_iters=2, seed_size=48)
    v2, o2 = train_unigram(docs, vocab_size=32, n_iters=2, seed_size=48)
    assert v1 == v2
    assert o1 == o2


def _brute_expected(word, logp, max_len):
    """Enumerate every segmentation; posterior-weighted piece counts +
    marginal log-likelihood — the exhaustive oracle for forward-backward."""
    import itertools as it

    n = len(word)
    total = 0.0
    weighted = {}
    for cuts in it.product([0, 1], repeat=n - 1):
        bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        prob = 1.0
        pieces = []
        ok = True
        for a, b in zip(bounds, bounds[1:]):
            if b - a > max_len:
                ok = False
                break
            piece = word[a:b]
            lp = logp.get(piece)
            if lp is None:
                if b - a > 1:
                    ok = False
                    break
                lp = UNK_PENALTY
            prob *= math.exp(lp)
            pieces.append(piece)
        if not ok:
            continue
        total += prob
        for p in pieces:
            weighted[p] = weighted.get(p, 0.0) + prob
    return ({p: w / total for p, w in weighted.items()}, math.log(total))


def test_forward_backward_matches_enumeration():
    from ticdc_spark.llm.unigram import forward_backward

    logp = _logp_from_counts({"a": 10, "b": 8, "ab": 6, "ba": 2, "aba": 1})
    for word in ["ab", "aba", "abab", "bbaa", "abz"]:
        expected, z = forward_backward(word, logp, 3)
        want, want_z = _brute_expected(word, logp, 3)
        assert z == pytest.approx(want_z, abs=1e-9)
        assert set(expected) == set(want)
        for p in want:
            assert expected[p] == pytest.approx(want[p], abs=1e-9)


def test_full_em_monotone_and_deterministic(spark):
    from ticdc_spark.llm.unigram import em_full_pass, seed_pieces, word_counts

    docs = spark.createDataFrame(
        [(i, "tok en token token aba ab") for i in range(30)],
        "doc_id long, text string")
    wc = word_counts(docs).cache()
    seed = {r["piece"]: int(r["count"]) for r in
            seed_pieces(wc, 4, 64).collect()}
    c1, ll1 = em_full_pass(wc, seed)
    c2, ll2 = em_full_pass(wc, c1)
    c3, ll3 = em_full_pass(wc, c2)
    assert ll2 >= ll1 - 1e-6 and ll3 >= ll2 - 1e-6  # EM guarantee
    # fixed-point counts -> identical reruns
    c1b, ll1b = em_full_pass(wc, seed)
    assert c1 == c1b and ll1 == ll1b


def test_train_unigram_full_em_mode(spark):
    """em_mode='full': the integrated trainer runs forward-backward
    E-steps — marginal log-likelihood is monotone non-decreasing within
    an EM block (the EM guarantee, which Viterbi hard-EM lacks), the
    run is deterministic, and the planted subword still wins."""
    rows = [(i, "tok" + ("en " * 3) + "token token zzq") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    v1, o1 = train_unigram(docs, vocab_size=24, n_iters=3,
                           max_piece_len=4, seed_size=64, em_mode="full")
    for a, b in zip(o1[:2], o1[1:3]):
        assert b >= a - 1e-6
    pieces = dict(v1)
    assert "toke" in pieces or "tok" in pieces
    for ch in "tokenzq":
        assert ch in pieces
    v2, o2 = train_unigram(docs, vocab_size=24, n_iters=3,
                           max_piece_len=4, seed_size=64, em_mode="full")
    assert v1 == v2 and o1 == o2
    import pytest as _pytest
    with _pytest.raises(ValueError):
        train_unigram(docs, em_mode="soft")
