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
        F.size(toks).cast("long").alias("n_tokens"),
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


CHUNK_SIZE = 64
CHUNK_STRIDE = 48

def chunk_documents(
    docs: DataFrame, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Fixed-size token chunking with overlap (size − stride tokens) — the
    standard training-data windowing op. Map-side: sequence of chunk
    starts → posexplode → slice; no shuffle, scales linearly over splits.
    Output: one row per (doc, chunk) with the chunk text, its token
    count, and a content digest for chunk-level dedup."""
    toks = tokens_col()
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride))
    ex = docs.select(
        "doc_id",
        toks.alias("_t"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    chunk_text = F.array_join(F.slice("_t", F.col("start"), size), " ")
    return ex.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.least(F.lit(size), F.size("_t") - F.col("start") + 1)
        .cast("long").alias("n_chunk_tokens"),
        chunk_text.alias("chunk_text"),
        F.md5(chunk_text).alias("chunk_fp"),
    )


# PII patterns kept to constructs with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): char classes, bounded reps, no lookaround.
PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def redact_pii(docs: DataFrame, text: Column = None) -> DataFrame:
    """PII scrubbing: replace emails/phone numbers with typed placeholder
    tokens and count the redactions — pure regexp column algebra (at
    100 TB this is a map-only pass; counts feed the pipeline's PII
    telemetry)."""
    t = F.col("text") if text is None else text
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        redacted.alias("redacted_text"),
        F.md5(redacted).alias("redacted_fp"),
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


def stratified_sample(
    docs: DataFrame, fractions: dict[str, float], default: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic hash-based stratified sampling: keep a row iff
    ``h(doc_id)/2^32 < fraction[lang]``. Unlike ``df.sample`` this is
    reproducible across engines/runs/partitionings (portable md5 hash —
    the property a 100 TB pipeline needs for resumable sampling), and
    it's a pure map-side filter: no shuffle, pushes down to the scan."""
    from ticdc_spark.operators.routing import hash32_md5

    u = hash32_md5(
        F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string"))
    ) / F.lit(4294967296.0)
    frac: Column = F.lit(default)
    for lang, f in sorted(fractions.items()):
        frac = F.when(F.col("lang") == lang, F.lit(f)).otherwise(frac)
    return docs.filter(u < frac)


def training_manifest(
    docs: DataFrame,
    quality_min: float = 0.45,
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """The composed training-data selection pipeline: quality filter →
    exact-dedup to the canonical copy (min doc_id per content hash) →
    deterministic stratified sample → manifest of what goes into the
    training set.

    Single-pass plan: quality columns are computed inline on the scan (no
    self-join), canonical-copy selection is ``min(doc_id) over
    (partition by md5(text))`` — ONE shuffle total, vs the naive
    groupBy + two joins (3 shuffles). At 100 TB the window's per-group
    state is one long, and the quality/sample filters run map-side
    before it."""
    from pyspark.sql.window import Window

    fractions = fractions or {"en": 0.9, "de": 0.8, "fr": 0.8, "es": 0.5, "zh": 0.5}
    toks = tokens_col()
    n_tokens = F.size(toks).cast("double")
    length_part = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    marker_part = _marker_ratio(MARKERS["en"] + MARKERS["de"] + MARKERS["fr"])
    diversity = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    quality = F.round(
        F.lit(0.3) * length_part + F.lit(0.4) * marker_part
        + F.lit(0.3) * diversity, 6)
    # Canonical-copy selection runs over ALL docs (dedup decisions must
    # not depend on downstream sampling), so the window comes first;
    # quality/sample filters are map-side after it.
    canon_min = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    with_q = (
        docs.withColumn("_canon", canon_min)
        .withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn("quality", quality)
    )
    return (
        stratified_sample(with_q, fractions)
        .filter(F.col("quality") >= quality_min)
        .filter(F.col("doc_id") == F.col("_canon"))
        .select("doc_id", "lang", "source", "n_tokens", "quality")
    )


def grams_col(n: int, text: Column = None) -> Column:
    """Word n-grams WITH multiplicity (order preserved) — repetition
    metrics need counts, not the distinct set `shingles_col` gives."""
    toks = tokens_col(text)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_metrics(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition quality signals, adapted to word-stream
    documents: the fraction of 2-grams occupied by the single most
    frequent 2-gram, and the fraction of 3-grams that are repeats of an
    earlier occurrence. High values mark degenerate/boilerplate text.

    Scale: map-only over splits (no shuffle), Arrow-batched
    ``mapInPandas`` with a per-doc Counter — the genuine
    built-ins-can't-do-it-efficiently case: the equivalent
    higher-order-function formulations are interpreted per element and
    measured 6× (sorted run-length fold) to 60× (distinct×total scan)
    slower at sf0.1. Rounding is ``floor(x·1e6 + 0.5)/1e6`` — bit-equal
    to DuckDB's ties-away ROUND (Python's ``round`` is banker's and
    diverges at exact ties like 1/128).
    """
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType([
        StructField("doc_id", docs.schema["doc_id"].dataType),
        StructField("n_2grams", IntegerType()),
        StructField("top_2gram_frac", DoubleType()),
        StructField("dup_3gram_frac", DoubleType()),
        StructField("repetitious", BooleanType()),
    ])

    def _rep_batches(batches):
        import math
        from collections import Counter

        import pandas as pd

        def r6(x):
            return math.floor(x * 1e6 + 0.5) / 1e6

        for pdf in batches:
            out = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                t = text.split(" ")
                g2 = [t[i] + " " + t[i + 1] for i in range(len(t) - 1)]
                g3 = [
                    t[i] + " " + t[i + 1] + " " + t[i + 2]
                    for i in range(len(t) - 2)
                ]
                n2 = len(g2)
                top2 = (
                    r6(Counter(g2).most_common(1)[0][1] / n2) if n2 else None
                )
                dup3 = r6((len(g3) - len(set(g3))) / len(g3)) if g3 else None
                out.append((
                    did, n2, top2, dup3,
                    (top2 or 0) > 0.10 or (dup3 or 0) > 0.02,
                ))
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    return docs.select("doc_id", "text").repartition(parallelism).mapInPandas(
        _rep_batches, schema)


def tfidf_keywords(docs: DataFrame, k: int = 5) -> DataFrame:
    """TF-IDF keyword extraction: top-k terms per document by
    tf * ln(N/df) — keyword tagging / topic features for a training
    corpus.

    Scale shape: one explode + two partial-aggregated groupBys + the
    per-doc rank window; the document-frequency table is
    vocabulary-sized, so it and the corpus count join back via
    BROADCAST — the big (doc, term) side is never re-shuffled for the
    join, only for the final doc-window rank.
    Scores round to 6 decimals before ranking so the ordering is
    engine-portable (ln differs in the last ulp across libms);
    deterministic tie-break on the term text.
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(F.broadcast(df_), "term").crossJoin(F.broadcast(n))
    score = F.round(
        F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
    )
    ranked = scored.withColumn("score", score).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.desc("score"), F.asc("term")
            )
        ),
    )
    return ranked.filter(F.col("rk") <= k).select(
        "doc_id", "term", "tf", "df", "score", "rk"
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Unigram LM quality score: avg ln p(token) per document under the
    corpus's own unigram distribution — the cheap stand-in for KenLM
    perplexity filtering in pretraining-data pipelines (low average
    log-probability = unusual/noisy text).

    Scale shape: one explode, one (term) aggregation whose output is
    vocabulary-sized and broadcast back onto the token stream, then a
    per-doc aggregation. The corpus token total rides the same broadcast.
    Rounded to 6 decimals for engine-portable ln.
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tc"))
    total = toks.agg(F.count(F.lit(1)).alias("corpus_tokens"))
    scored = (
        toks.join(F.broadcast(counts), "term")
        .crossJoin(F.broadcast(total))
        .withColumn("_lp", F.log(F.col("tc") / F.col("corpus_tokens")))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("_lp"), 6).alias("avg_logprob"),
    )


def dsir_importance(docs: DataFrame, target_pred=None) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by ``log w(x) = Σ_tok [ln p_target(tok) − ln q_raw(tok)]``
    under two add-one-smoothed unigram LMs — the target domain's and the
    whole corpus's. High weight = looks like the target domain; the
    paper resamples raw data proportionally to w.

    ``target_pred``: boolean Column selecting the target-domain docs
    (default: English documents — the "high-quality reference" slice).

    Scale shape: one token explode; two vocabulary-sized aggregations
    broadcast back onto the token stream; one per-doc fold. Identical
    plan to `unigram_logprob` with a second LM riding the same joins.
    """
    if target_pred is None:
        target_pred = F.col("lang") == "en"
    toks = docs.select(
        "doc_id", target_pred.alias("_tgt"),
        F.explode(F.split(F.col("text"), " ")).alias("term"),
    ).filter(F.col("term") != "")
    counts = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("qc"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("pc"),
    )
    totals = counts.agg(
        F.sum("qc").alias("q_total"),
        F.sum("pc").alias("p_total"),
        F.count(F.lit(1)).alias("vocab"),
    )
    scored = (
        toks.join(F.broadcast(counts), "term")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_lw",
            F.log((F.col("pc") + 1) / (F.col("p_total") + F.col("vocab")))
            - F.log((F.col("qc") + 1) / (F.col("q_total") + F.col("vocab"))),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum("_lw"), 6).alias("log_weight"),
        # flag derives from the ROUNDED weight so the boundary is
        # engine-portable (raw double sums can differ in the last ulp)
        (F.round(F.sum("_lw"), 6) > 0).alias("target_like"),
    )


SEQ_LEN = 512


def sequence_packing(docs: DataFrame, seq_len: int = SEQ_LEN) -> DataFrame:
    """Training-sequence packing: concatenate documents in order within
    each (source, lang) stratum and split the token stream into fixed
    ``seq_len`` windows — the standard GPT-style pretraining batch
    construction (documents packed back-to-back, a document may span
    two sequences).

    Output per doc: (doc_id, source, lang, n_tokens, start_offset,
    first_bin, last_bin, n_bins) where offsets index the stratum's
    token stream and bins are the seq_len windows the doc touches.

    Scale shape: one per-stratum window cumsum — partitioned by the
    packing domain, never a global sort; everything else is arithmetic
    on the cumulative offset.
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", "source", "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("source", "lang").orderBy("doc_id")
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    out = (
        toks.withColumn("_cum", cum)
        .withColumn("start_offset", F.col("_cum") - F.col("n_tokens"))
        .withColumn("first_bin", F.expr(f"start_offset div {seq_len}"))
        .withColumn("last_bin", F.expr(f"(_cum - 1) div {seq_len}"))
    )
    return out.select(
        "doc_id", "source", "lang", "n_tokens", "start_offset",
        "first_bin", "last_bin",
        (F.col("last_bin") - F.col("first_bin") + 1).alias("n_bins"),
    )


def bpe_pair_stats(docs: DataFrame, top_k: int = 50) -> DataFrame:
    """First BPE merge-step statistics (Sennrich et al. 2016): corpus
    word frequencies, then adjacent symbol-pair counts weighted by word
    frequency, with the end-of-word marker ``</w>`` as the final
    symbol.  Top-k pairs by count (pair asc tiebreak — deterministic
    boundary).

    Scale shape: the word-count table is vocabulary-sized, the pair
    table is smaller still; the only corpus-sized stage is the token
    explode + groupBy.  The top-k is ``orderBy().limit()`` — Spark
    plans TakeOrdered (per-partition heaps + driver merge of k rows),
    not a global sort.
    """
    wc = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
        .withColumn("len", F.length("w"))
    )
    pos = wc.select(
        "w", "n", "len",
        F.explode(F.sequence(F.lit(1), F.col("len"))).alias("i"),
    )
    pairs = pos.select(
        F.when(F.col("i") < F.col("len"), F.expr("substring(w, i, 2)"))
        .otherwise(F.concat(F.expr("substring(w, len, 1)"), F.lit("</w>")))
        .alias("pair"),
        "n",
    )
    return (
        pairs.groupBy("pair").agg(F.sum("n").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(top_k)
    )


# A shipped tokenizer artifact: BPE merges applied in priority order
# (tokenizers are static deliverables — the analog of the IVF/PQ
# codebook literals).  Greedy global application per merge, standard
# BPE encode semantics.
BPE_MERGES = [
    ("t", "h"), ("e", "r"), ("i", "n"), ("a", "n"), ("o", "n"),
    ("e", "n"), ("t", "e"), ("o", "r"), ("s", "t"), ("a", "r"),
    ("th", "e"), ("an", "d"), ("in", "g"), ("e", "d"), ("a", "l"),
    ("r", "e"), ("t", "o"), ("o", "u"), ("i", "s"), ("a", "t"),
]


def bpe_encode_stats(docs: DataFrame) -> DataFrame:
    """Per-doc EXACT subword counts under the shipped merge table
    (replaces the ceil(len/4) estimate of `token_stats`): each word
    becomes a spaced symbol string, the merges chain as plain
    `replace` calls (priority order), and the surviving symbol count
    sums per document."""
    word = F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    words = docs.select("doc_id", word).filter(F.length("w") > 0)
    sym = F.concat(F.regexp_replace(F.col("w"), "(.)", "$1 "), F.lit("</w>"))
    enc = sym
    for a, b in BPE_MERGES:
        enc = F.replace(enc, F.lit(f"{a} {b}"), F.lit(a + b))
    per_word = words.select(
        "doc_id", F.size(F.split(enc, " ")).alias("n_sub"))
    return per_word.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_sub").cast("long").alias("n_subwords"),
    )


def _sql_str(v: str) -> str:
    """SQL string literal (the sentinel chr(1) passes through raw)."""
    return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"


def bpe_train_merges(docs: DataFrame, k: int = 4) -> DataFrame:
    """Train ``k`` BPE merge steps over the corpus word counts (the
    Sennrich et al. 2016 loop): symbolize every distinct word, then
    repeat — count adjacent symbol pairs weighted by word frequency,
    take the most frequent pair (ties: lexicographically smallest
    pair), and merge its leftmost non-overlapping occurrences in every
    word.

    Symbol strings are sentinel-wrapped — every symbol is enclosed in
    ``\x01`` markers (``\x01a\x01\x01b\x01`` for ``a b``) — so the
    merge is a plain ``replace`` of ``\x01l\x01\x01r\x01`` with
    ``\x01lr\x01``: the sentinels anchor both symbol boundaries (no
    cross-boundary matches like ``c + ab`` fusing on pair ``(c,a)``)
    and each pair owns its own markers, so consecutive merges in one
    word (``a a a a`` → ``aa aa``) resolve exactly like the reference
    algorithm.  Identical semantics on any engine with leftmost
    non-overlapping ``replace``.

    Returns the learned merge table (step, left, right, pair_count) —
    control-plane sized.

    Scale shape per step: one shuffle for the weighted pair count; the
    winning pair is a broadcast 1-row aggregate (TakeOrdered, no
    driver collect of data); the merge itself is a map-only string
    replace.  k steps = k shuffles over the DISTINCT-WORD table, not
    the corpus.
    """
    sep = "\x01"
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
        .withColumn("sym", F.regexp_replace("w", "(.)", f"{sep}$1{sep}"))
        .cache()
    )
    # symbols = split(trim both sentinels, sentinel-pair); guard
    # single-symbol words (Spark sequence(1, 0) counts DOWN)
    syms = f"split(trim(BOTH '{sep}' FROM sym), '{sep}{sep}')"
    merges: list[tuple[int, str, str, int]] = []
    for step in range(k):
        pairs = words.filter(F.expr(f"size({syms}) >= 2")).select(
            "n",
            F.explode(
                F.expr(f"transform(sequence(1, size({syms}) - 1), "
                       f"i -> concat(element_at({syms}, i), ' ', "
                       f"element_at({syms}, i + 1)))")
            ).alias("pair"),
        )
        # the winner is ONE row of plan metadata (the k-means-codebook
        # precedent): collecting it lets the merge fold in as literals,
        # so each step is exactly one pair-count shuffle over the
        # CACHED word table instead of a k-deep recomputed lineage
        top = (pairs.groupBy("pair").agg(F.sum("n").alias("pair_count"))
               .orderBy(F.col("pair_count").desc(), F.col("pair"))
               .limit(1).collect())
        if not top:
            break
        pair, count = top[0]["pair"], int(top[0]["pair_count"])
        left, right = pair.split(" ", 1)
        merges.append((step, left, right, count))
        old = words
        words = words.withColumn(
            "sym",
            F.expr("replace(sym, {}, {})".format(
                _sql_str(f"{sep}{left}{sep}{sep}{right}{sep}"),
                _sql_str(f"{sep}{left}{right}{sep}")))
        ).cache()
        words.count()      # materialize before dropping the parent
        old.unpersist()
    return spark.createDataFrame(
        merges, "step long, left string, right string, pair_count long")


def winnowing_fingerprints(docs: DataFrame, k: int = 4,
                           w: int = 5) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the
    MOSS algorithm): hash every ``k``-gram, slide a window of ``w``
    consecutive hashes, keep the minimum of each window — the
    guarantee is that any shared substring of length >= ``k+w-1``
    tokens contributes at least one shared fingerprint, at ~2/(w+1)
    the density of full k-gram sets.  Value-set semantics (distinct
    mins) make the tie-breaking rule irrelevant for equality joins.

    Arrow-batched ``mapInPandas``: the pure-HOF formulation re-inlines
    the md5-gram subtree into every window lambda (Catalyst does not
    CSE across nested lambdas), going quadratic per doc — measured
    ~40x slower than this kernel at sf0.1.  Map-only either way; the
    Python path is the sanctioned one for per-row kernels
    (house precedent: repetition_metrics, PQ codes).
    """
    from collections.abc import Iterator as _It
    from hashlib import md5 as _md5

    import pandas as _pd

    min_tokens = k + w - 1

    def run(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            ids, ngs, nfs, fps_col = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = text.split(" ")
                n = len(toks)
                if n < min_tokens:
                    continue
                hs = [
                    int(_md5(" ".join(toks[i:i + k]).encode())
                        .hexdigest()[:8], 16)
                    for i in range(n - k + 1)
                ]
                mins = {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}
                ids.append(doc_id)
                ngs.append(n - k + 1)
                nfs.append(len(mins))
                fps_col.append(sorted(mins))
            yield _pd.DataFrame({
                "doc_id": _pd.Series(ids, dtype="int64"),
                "n_grams": _pd.Series(ngs, dtype="int64"),
                "n_fingerprints": _pd.Series(nfs, dtype="int64"),
                # object dtype: an empty partition otherwise infers
                # float64 and Arrow can't cast that to list<long>
                "fingerprints": _pd.Series(fps_col, dtype="object"),
            })

    return docs.select("doc_id", "text").mapInPandas(
        run,
        "doc_id long, n_grams long, n_fingerprints long, "
        "fingerprints array<long>",
    )


def winnowing_near_dup(docs: DataFrame, k: int = 4, w: int = 5,
                       min_shared: int = 3,
                       max_df_pct: int = 1) -> DataFrame:
    """Near-dup candidate pairs over the winnowing fingerprint index:
    explode each document's fingerprint set, equi-join on the
    fingerprint value, keep pairs sharing >= ``min_shared``.

    This is the shingle inverted-index join at ~2/(w+1) the density —
    the winnowing guarantee keeps recall for shared runs >= k+w-1
    tokens while the join input shrinks ~3x at w=5.

    CRUCIAL at scale: winnowing's min-selection BIASES fingerprints
    toward the globally smallest hashes of common grams, so hot keys
    are worse than in a plain shingle index — a fingerprint present in
    > ``max_df_pct``% of documents is a stop-gram whose join key
    would go quadratic (observed: the unpruned join ran 100x slower
    one SF up), and it carries no near-dup signal.  The hot set is
    tiny by construction, so removal is a broadcast anti-join — the
    same shape as the hot-shingle-pruned Jaccard.
    """
    wf = winnowing_fingerprints(docs, k=k, w=w).cache()
    fps = wf.select("doc_id", F.explode("fingerprints").alias("fp"))
    tot = F.broadcast(wf.agg(F.count(F.lit(1)).alias("n_docs")))
    # per-doc sets are distinct, so count(*) IS document frequency
    hot = (
        fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(tot)
        .filter(F.col("df") * (100 // max_df_pct) > F.col("n_docs"))
        .select("fp")
    )
    kept = fps.join(F.broadcast(hot), "fp", "left_anti")
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"),
                 F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
