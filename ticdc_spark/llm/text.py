"""Text analysis operators for the training-data pipeline (beyond-reference,
SURVEY §7.2 phase 7): tokenization, language-ID heuristic, quality
scoring, token counting, document fingerprinting.

All operators are pure column algebra over the ``documents`` table —
JVM-side, whole-stage codegen, zero shuffle, linearly scalable: at
100 TB these run map-only over parquet splits. Heuristics are
deterministic so the DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker token sets for the language-ID heuristic (n-gram/stopword-ratio
# style). The corpus is synthetic, so markers are drawn from its actual
# vocabulary; the mechanism (ratio-of-markers argmax) is the real one.
MARKERS = {
    "en": ("table", "row", "value", "column"),
    "de": ("scan", "filter", "merge"),
    "fr": ("join", "hash", "batch"),
}


def tokens_col(text: Column = None) -> Column:
    text = F.col("text") if text is None else text
    return F.split(text, " ")


def shingles_col(n: int = 3, text: Column = None) -> Column:
    """Distinct word n-gram shingles (1-based slice, portable)."""
    toks = tokens_col(text)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _marker_ratio(markers: tuple[str, ...]) -> Column:
    toks = tokens_col()
    hits = F.size(F.filter(toks, lambda t: t.isin(*markers)))
    return hits.cast("double") / F.size(toks)


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: argmax of marker-token ratios with a
    deterministic tiebreak (en > de > fr > unknown)."""
    r_en, r_de, r_fr = (_marker_ratio(MARKERS[k]) for k in ("en", "de", "fr"))
    pred = (
        F.when((r_en >= r_de) & (r_en >= r_fr) & (r_en > 0), F.lit("en"))
        .when((r_de >= r_fr) & (r_de > 0), F.lit("de"))
        .when(r_fr > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.round(r_en, 6).alias("r_en"),
        F.round(r_de, 6).alias("r_de"),
        F.round(r_fr, 6).alias("r_fr"),
        pred.alias("predicted_lang"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Composite quality: length saturation + marker ratio + lexical
    diversity (distinct/total tokens) — the standard cheap pre-filters of
    a training-data pipeline."""
    toks = tokens_col()
    n_tokens = F.size(toks).cast("double")
    length_part = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    marker_part = _marker_ratio(MARKERS["en"] + MARKERS["de"] + MARKERS["fr"])
    diversity = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    score = F.lit(0.3) * length_part + F.lit(0.4) * marker_part + F.lit(0.3) * diversity
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(F.lit(1.0) * marker_part, 6).alias("marker_ratio"),
        F.round(diversity, 6).alias("diversity"),
        F.round(score, 6).alias("quality"),
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (ceil(chars/4) per token, the common ~4-chars-per-token rule)."""
    toks = tokens_col()
    n_tokens = F.size(toks)
    n_subwords = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )
    return docs.select(
        "doc_id",
        F.col("n_chars"),
        F.length("text").alias("measured_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        n_subwords.alias("n_subwords_est"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprints: full-content digest + 64-char prefix digest
    (rolling-hash analog for prefix dedup)."""
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("content_fp"),
        F.md5(F.substring(norm, 1, 64)).alias("prefix_fp"),
    )
