"""Corpus-level training-data operators: Bloom membership, mixture
weights, bigram-LM scoring, hashed linear quality classifier.

These fill the gaps a production pretraining pipeline has beyond
dedup/ANN (which live in `dedup.py` / `similarity.py`):

- **Bloom filter**: the cross-batch membership structure — build a tiny
  bit table over content digests, broadcast it, probe a new batch for
  "seen before" without joining against the full history.  The OR
  aggregation is merge-associative, so partial (map-side) aggregation
  applies and the result is a few KB regardless of corpus size: the
  canonical 100 TB shape (the filter ships to the data, never the
  reverse).
- **Mixture weights**: per-source temperature sampling (w ∝ n_tokens^α,
  α = 0.5) with an integer-exact closed form — the "how much of each
  source per epoch" datasheet every data-mixing run starts from.
- **Bigram LM**: Laplace-smoothed P(w2|w1) trained on the corpus itself,
  scored back over every document in integer micro-nats (CCNet-style
  perplexity filtering, one model class up from `text.py`'s unigram).
- **Quality classifier**: fasttext-shaped linear scorer over hashed
  token buckets with a deterministic weight table — the plumbing of
  classifier-based filtering with a model both engines can recompute.

Everything is integer arithmetic after hashing (md5-derived buckets,
micro-nat log rounding, ppm weights), so Spark and any ANSI oracle
produce bit-identical results — the same portability discipline as
`functions/sketch.py`.

No reference parity to cite: TiCDC has no corpus operators; this is the
beyond-reference surface (SURVEY §7.2 phase 7).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# -- Bloom parameters (shared with the oracle SQL) ---------------------------
# Sized SMALL on purpose (m/n ≈ 8 at the 500-key fixture) so the probe
# query observes real false positives — a filter nothing ever collides
# with proves nothing.  Production sizing: m ≈ 10–15 bits/key for ~1% FP;
# the structure is identical, only the constants grow.
BLOOM_BITS = 1 << 12          # m: 4,096 bits
BLOOM_WORD_BITS = 32          # positive-range words (no sign-bit traps)
BLOOM_WORDS = BLOOM_BITS // BLOOM_WORD_BITS
BLOOM_K = 4                   # hash functions

QC_BUCKETS = 1024             # quality classifier: hashed feature space
QC_MULT = 2654435761          # Knuth multiplicative constant
QC_THRESHOLD_MILLI = 50       # keep when mean token weight > 0.05


def _bloom_pos(key: F.Column, i: int) -> F.Column:
    """Hash ``i`` of ``key`` → bit position in [0, BLOOM_BITS).  48-bit
    md5 prefix (same trick as `functions/sketch.py:52`) keeps the mod
    unbiased to ~2^-32."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(i)), key)), 1, 12),
        16, 10,
    ).cast("long")
    return h % F.lit(BLOOM_BITS)


def bloom_build(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """(word_idx, word) bit table: OR of 1<<bit over all keys' K
    positions.  One shuffle (the groupBy), output ≤ BLOOM_WORDS rows."""
    pos = keys.select(
        F.explode(
            F.array(*[_bloom_pos(F.col(key_col), i)
                      for i in range(BLOOM_K)])
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / BLOOM_WORD_BITS).cast("long").alias("word_idx"),
            F.expr(f"shiftleft(1L, cast(pos % {BLOOM_WORD_BITS} as int))")
            .alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )


def bloom_probe(candidates: DataFrame, bloom: DataFrame,
                key_col: str = "key") -> DataFrame:
    """Membership probe: key → K (word_idx, mask) lookups, broadcast
    join against the bit table, hit iff every mask is fully set.
    Missing words (never touched at build) mean definitely-absent."""
    lookups = candidates.select(
        key_col,
        F.explode(
            F.array(*[_bloom_pos(F.col(key_col), i)
                      for i in range(BLOOM_K)])
        ).alias("pos"),
    ).select(
        key_col,
        (F.col("pos") / BLOOM_WORD_BITS).cast("long").alias("word_idx"),
        F.expr(f"shiftleft(1L, cast(pos % {BLOOM_WORD_BITS} as int))")
        .alias("mask"),
    )
    joined = lookups.join(F.broadcast(bloom), "word_idx", "left")
    return (
        joined.groupBy(key_col)
        .agg(
            F.min(
                (F.coalesce(F.col("word"), F.lit(0))
                 .bitwiseAND(F.col("mask")) == F.col("mask")).cast("int")
            ).alias("_all_set")
        )
        .select(key_col, (F.col("_all_set") == 1).alias("bloom_hit"))
    )


def mixture_weights(docs: DataFrame, alpha_sqrt: bool = True,
                    token_budget: int = 10_000_000) -> DataFrame:
    """Per-source temperature-sampling weights, integer-exact.

    w_s ∝ n_tokens^0.5 (α = 0.5 flattens head sources, the standard
    multi-source pretraining temperature).  Computed as
    ns = floor(sqrt(n_tokens · 10^6)) — IEEE sqrt is correctly rounded,
    so ns is engine-deterministic — then ppm weights by exact integer
    division.  ``alloc_tokens`` splits ``token_budget`` by weight;
    ``epochs_milli`` = how many times the source repeats (×1000).
    """
    assert alpha_sqrt, "only α=0.5 is wired (the common choice)"
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    ns = F.floor(F.sqrt(F.col("n_tokens") * F.lit(1_000_000.0))).cast("long")
    scored = per_source.withColumn("ns", ns)
    # grand total via agg + broadcast cross join: no single-partition
    # global window (n_sources rows, but the plan shape matters)
    total = scored.agg(F.sum("ns").cast("long").alias("total_ns"))
    scored = scored.crossJoin(F.broadcast(total))
    return (
        scored.withColumn(
            "weight_ppm",
            F.expr("ns * 1000000 div total_ns").cast("long"),
        )
        .withColumn(
            "alloc_tokens",
            F.expr(f"weight_ppm * {token_budget} div 1000000").cast("long"),
        )
        .withColumn(
            "epochs_milli",
            F.expr("alloc_tokens * 1000 div n_tokens").cast("long"),
        )
        .select("source", "n_docs", "n_tokens", "weight_ppm",
                "alloc_tokens", "epochs_milli")
    )


def bigram_table(docs: DataFrame) -> DataFrame:
    """Corpus bigram counts: (w1, w2, c12).  Map-only expansion (zip of
    the token array with its own shift) then one groupBy shuffle."""
    toks = docs.select(F.split("text", " ").alias("toks"))
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(toks, 1, size(toks) - 1)").alias("w1"),
                F.expr("slice(toks, 2, size(toks) - 1)").alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    return pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )


def bigram_logprob(docs: DataFrame) -> DataFrame:
    """Score every document under the corpus's own Laplace-smoothed
    bigram LM: P(w2|w1) = (c12+1)/(c1+V), summed in integer micro-nats
    (round(ln P · 10^6) per bigram — order-independent, engine-exact).

    Shape: bigram table + context table are corpus-sized → shuffle hash
    joins on (w1,w2)/w1; at 100 TB both stay partitioned (no broadcast
    assumed).  The per-doc fold is one groupBy on doc_id.
    """
    bg = bigram_table(docs)
    ctx = bg.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    vocab = bg.select("w2").distinct().count()  # plan-time scalar (small)

    doc_pairs = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select(
        "doc_id",
        F.posexplode(
            F.arrays_zip(
                F.expr("slice(toks, 1, size(toks) - 1)").alias("w1"),
                F.expr("slice(toks, 2, size(toks) - 1)").alias("w2"),
            )
        ).alias("pos", "bg"),
    ).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    scored = (
        doc_pairs.join(bg, ["w1", "w2"])
        .join(ctx, "w1")
        .withColumn(
            "micro_nats",
            F.round(
                F.log((F.col("c12") + 1) / (F.col("c1") + F.lit(vocab)))
                * 1_000_000
            ).cast("long"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("micro_nats").cast("long").alias("logprob_micro"),
    )


def quality_classifier(docs: DataFrame) -> DataFrame:
    """Linear quality scorer over hashed token features.

    bucket(t) = md5(t)[0:7] mod QC_BUCKETS; the weight table is the
    deterministic milli-valued w(b) = (b·QC_MULT) mod 2001 − 1000 ∈
    [−1, 1] — a stand-in both engines recompute instead of shipping a
    trained artifact (swap in real learned weights as a broadcast table
    at deploy time; the plumbing is identical).  keep ⇔ mean token
    weight > QC_THRESHOLD_MILLI/1000, tested as the cross-multiplied
    integer predicate (no division, no floats).  Map-only + one groupBy.
    """
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    )
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 7), 16, 10).cast("long")
        % QC_BUCKETS
    )
    weighted = tok.select(
        "doc_id",
        ((bucket * QC_MULT) % 2001 - 1000).alias("w_milli"),
    )
    return (
        weighted.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("w_milli").cast("long").alias("score_milli"),
        )
        .withColumn(
            "keep",
            F.col("score_milli")
            > F.col("n_toks") * F.lit(QC_THRESHOLD_MILLI),
        )
    )
