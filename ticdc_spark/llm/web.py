"""Web-corpus curation operators: URL canonicalization + URL-level
dedup, boilerplate-paragraph removal, C4-style line filtering, and
Gopher-style document rule flags.

These are the page-level cleanup passes a crawl-derived training
pipeline runs before the content-level dedup in ``llm/dedup.py``
(public recipes: C4 — Raffel et al. 2020 §2.2; Gopher — Rae et al.
2021 Appendix A; RefinedWeb — Penedo et al. 2023 §3).

Scale shapes (100 TB stance):

- ``normalize_url`` / ``gopher_rules`` / line- and paragraph-splitting
  are map-only JVM column algebra — no shuffle, no Python.
- ``url_dedup`` is ONE shuffle on the canonical URL.
- ``paragraph_dedup`` shuffles once on the paragraph string to count
  document frequency; the boilerplate set (paragraphs above the df
  threshold) is tiny by construction — a paragraph must appear in >=2%
  of all documents to qualify — so removal is a **broadcast** hash
  join, and reassembly is one shuffle on doc_id.  No self-joins.
- ``c4_line_filter`` is map-only per line plus one reassembly shuffle
  on doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# params stripped during URL canonicalization (tracking noise)
TRACKING_PARAM_RE = r"^(utm_[^=]*|ref|fbclid|gclid)(=|$)"

# Gopher-style rule thresholds (integer-scaled: x100 for mean word
# length, x1000 for ratios — BIGINT-exact on both engines, NOTES_r2's
# "never hash raw float sums" rule)
GOPHER_MIN_WORDS = 40
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN_C = 380     # 3.80 chars
GOPHER_MAX_MEAN_LEN_C = 1_000   # 10.00 chars
GOPHER_MIN_STOPWORDS = 2
GOPHER_MAX_SYM_RATIO_M = 100    # 10.0%
GOPHER_MIN_ALPHA_RATIO_M = 800  # 80.0%
STOPWORDS = ("the", "a", "of", "and", "to", "in", "that", "with")

# C4 line rules
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
C4_BAD_LINE_WORDS = ("javascript", "cookie")
C4_BAD_DOC_MARKERS = ("lorem ipsum", "{")


def normalize_url(url: Column | str) -> Column:
    """Canonicalize a URL with the standard public rules: drop the
    fragment, lowercase scheme and host, strip a ``www.`` host prefix
    and the scheme's default port, strip trailing slashes from the
    path (case-preserved), drop tracking query params
    (``utm_*``/``ref``/``fbclid``/``gclid``), and sort the survivors.

    Pure JVM column algebra (regexp + higher-order array functions);
    whole-stage-codegen friendly, no UDF.
    """
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    pathq = F.regexp_replace(rest, r"^[^/?]+", "")
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")) \
            .when(scheme == "https", F.regexp_replace(host, r":443$", "")) \
            .otherwise(host)
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.when(
        F.instr(pathq, "?") > 0, F.regexp_extract(pathq, r"\?(.*)$", 1)
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )


def url_dedup(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Group documents by canonical URL: the crawl-level dedup pass
    (same page fetched under tracking-param / casing / fragment
    variants).  Keeps the lowest doc_id as canonical.  ONE shuffle on
    the normalized URL."""
    return (
        docs.withColumn("norm_url", normalize_url(url_col))
        .groupBy("norm_url")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


def paragraph_dedup(docs: DataFrame, min_doc_freq: int = 3,
                    max_df_pct: int = 2,
                    carry: tuple[str, ...] = ()) -> DataFrame:
    """Remove boilerplate paragraphs (RefinedWeb §3.3 / CCNet-style):
    a paragraph appearing in >= ``max_df_pct``% of documents (and at
    least ``min_doc_freq`` absolute) is boilerplate (cookie banners,
    nav footers) and is dropped from every document; per-document
    paragraph order is preserved on reassembly.

    Plan: one shuffle to count per-paragraph document frequency, a
    **broadcast** anti-flag join back (the above-threshold set is tiny
    by construction — <= 100/max_df_pct distinct values), one shuffle
    on doc_id to reassemble.  Returns one row per input document.
    """
    paras = docs.select(
        "doc_id", *carry,
        F.posexplode(F.split("text", r"\n\n")).alias("pos", "para")
    )
    dfreq = paras.groupBy("para").agg(
        F.countDistinct("doc_id").alias("doc_freq"))
    total = docs.agg(F.count("*").alias("n_docs"))
    boiler = (
        dfreq.crossJoin(F.broadcast(total))
        .filter((F.col("doc_freq") >= min_doc_freq)
                & (F.col("doc_freq") * 100 >= F.col("n_docs") * max_df_pct))
        .select("para", F.lit(True).alias("is_boiler"))
    )
    flagged = paras.join(F.broadcast(boiler), "para", "left").withColumn(
        "is_boiler", F.coalesce("is_boiler", F.lit(False)))
    ordered = F.array_sort(
        F.collect_list(F.struct("pos", "para", "is_boiler")))
    return flagged.groupBy("doc_id", *carry).agg(
        F.count("*").alias("n_paras"),
        F.sum(F.col("is_boiler").cast("long")).alias("n_removed"),
        F.array_join(
            F.transform(
                F.filter(ordered, lambda x: ~x["is_boiler"]),
                lambda x: x["para"],
            ),
            "\n\n",
        ).alias("clean_text"),
    )


def c4_line_filter(docs: DataFrame,
                   carry: tuple[str, ...] = ()) -> DataFrame:
    """C4 cleanup (Raffel et al. 2020 §2.2) over newline-separated
    lines.  Line kept iff: >= 5 words, ends in terminal punctuation,
    and mentions none of the policy words (javascript/cookie).  The
    whole document is dropped when it contains "lorem ipsum" or a
    curly brace, or fewer than 3 lines survive.

    Map-only line predicates + one reassembly shuffle on doc_id.
    Returns one row per input document (dropped docs keep NULL
    clean_text so the decision is auditable).
    """
    low_doc = F.lower(F.col("text"))
    doc_bad = (F.instr(low_doc, C4_BAD_DOC_MARKERS[0]) > 0) | (
        F.instr(low_doc, C4_BAD_DOC_MARKERS[1]) > 0)
    lines = docs.select(
        "doc_id", *carry, doc_bad.alias("doc_bad"),
        F.posexplode(F.split("text", r"\n")).alias("pos", "line"),
    )
    low = F.lower(F.col("line"))
    keep_line = (
        (F.size(F.split(F.col("line"), " ")) >= C4_MIN_LINE_WORDS)
        & F.substring(F.col("line"), -1, 1).isin(".", "!", "?", '"')
        & (F.instr(low, C4_BAD_LINE_WORDS[0]) == 0)
        & (F.instr(low, C4_BAD_LINE_WORDS[1]) == 0)
    )
    flagged = lines.withColumn("keep_line", keep_line)
    ordered = F.array_sort(F.collect_list(F.struct("pos", "line", "keep_line")))
    agg = flagged.groupBy("doc_id", "doc_bad", *carry).agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("keep_line").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.filter(ordered, lambda x: x["keep_line"]),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("_joined"),
    )
    doc_kept = ~F.col("doc_bad") & (F.col("n_kept") >= C4_MIN_KEPT_LINES)
    return agg.select(
        "doc_id", *carry, "n_lines", "n_kept", doc_kept.alias("doc_kept"),
        F.when(doc_kept, F.col("_joined")).alias("clean_text"),
    )


def gopher_rules(docs: DataFrame,
                 carry: tuple[str, ...] = ()) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 App. A)
    as per-rule boolean flags + integer-scaled metrics.  Map-only.

    Metrics are BIGINT-exact: mean word length x100 via integer div,
    ratios x1000 via integer div — identical on any engine (total
    characters derive from ``length(text)`` minus the single-space
    separators, so no per-token aggregation is needed).
    """
    toks = F.split(F.col("text"), " ")
    wc = F.size(toks).cast("long")
    sum_chars = (F.length("text") - (wc - 1)).cast("long")
    # integer-scaled divisions: operands < 2^53 so the double division
    # below is exact before the floor-cast; non-negative, so cast==floor
    mean_len_c = F.floor(sum_chars * 100 / wc).cast("long")
    # case-insensitive: 'The'/'A' are stopwords, 'NASA' is alphabetic
    n_stop = F.size(
        F.array_intersect(F.transform(toks, F.lower),
                          F.array(*[F.lit(s) for s in STOPWORDS]))
    ).cast("long")
    n_sym = F.size(
        F.filter(toks, lambda t: (t == "#") | (t == "..."))).cast("long")
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))).cast("long")
    sym_m = F.floor(n_sym * 1000 / wc).cast("long")
    alpha_m = F.floor(n_alpha * 1000 / wc).cast("long")
    d = docs.select(
        "doc_id", wc.alias("word_count"), mean_len_c.alias("mean_word_len_c"),
        n_stop.alias("n_stopwords"), sym_m.alias("sym_ratio_m"),
        alpha_m.alias("alpha_ratio_m"), *carry,
    )
    r_wc = (F.col("word_count") >= GOPHER_MIN_WORDS) & (
        F.col("word_count") <= GOPHER_MAX_WORDS)
    r_len = (F.col("mean_word_len_c") >= GOPHER_MIN_MEAN_LEN_C) & (
        F.col("mean_word_len_c") <= GOPHER_MAX_MEAN_LEN_C)
    r_stop = F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS
    r_sym = F.col("sym_ratio_m") <= GOPHER_MAX_SYM_RATIO_M
    r_alpha = F.col("alpha_ratio_m") >= GOPHER_MIN_ALPHA_RATIO_M
    return d.select(
        "*", r_wc.alias("r_word_count"), r_len.alias("r_mean_len"),
        r_stop.alias("r_stopwords"), r_sym.alias("r_symbols"),
        r_alpha.alias("r_alpha"),
        (r_wc & r_len & r_stop & r_sym & r_alpha).alias("keep"),
    )


def curation_pipeline(docs: DataFrame) -> DataFrame:
    """The flagship curation composition: Gopher rule gate -> exact
    dedup among survivors -> per-source training manifest, in ONE plan.

    Dedup winners are picked with a single window over the content
    hash (rule-passers sort first, then lowest doc_id), so the whole
    pipeline costs exactly two shuffles: the md5 window and the
    per-source rollup.  Every stage count is auditable from the output
    (docs in, rule survivors, dedup winners, surviving tokens).
    """
    g = gopher_rules(docs, carry=("source", "text"))
    w = Window.partitionBy(F.md5("text")).orderBy(
        F.col("keep").desc(), F.col("doc_id"))
    flagged = g.withColumn("_rn", F.row_number().over(w)).withColumn(
        "is_winner", F.col("keep") & (F.col("_rn") == 1))
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_after_rules"),
        F.sum(F.col("is_winner").cast("long")).alias("n_after_dedup"),
        F.sum(F.when(F.col("is_winner"), F.col("word_count"))
              .otherwise(F.lit(0))).alias("tokens_after"),
    )


def registered_domain(host: Column | str) -> Column:
    """Last two dot-labels of a host — the registered-domain key used
    for domain-level stats/blocklists (public-suffix nuances like
    .co.uk need a suffix table; two labels is the standard first cut).
    """
    h = F.col(host) if isinstance(host, str) else host
    return F.when(
        h.rlike(r"[^.]+\.[^.]+$"),
        F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1),
    ).otherwise(h)


def domain_stats(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registered-domain rollup over canonical URLs: document
    count, distinct pages, token volume, language spread — the
    domain-level view a crawl pipeline filters on (blocklists, per-
    domain caps).  ONE shuffle on the domain key."""
    norm = normalize_url(url_col)
    host = F.regexp_extract(norm, r"^[a-z][a-z0-9+.-]*://([^/?]+)", 1)
    wc = F.size(F.split("text", " ")).cast("long")
    return (
        docs.select(
            registered_domain(host).alias("domain"),
            norm.alias("norm_url"), wc.alias("wc"), "lang",
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("norm_url").alias("n_pages"),
            F.sum("wc").alias("total_words"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


def curation_pipeline_full(docs: DataFrame) -> DataFrame:
    """The COMPLETE curation stack in one plan: boilerplate-paragraph
    removal -> C4 line/document filtering -> Gopher rules -> exact
    dedup -> per-source manifest with the audit counts of every stage.
    Stage order matters and is the production order: page-level
    cleanup first (so boilerplate never pollutes content hashes),
    document gates next, dedup among rule-passers last.

    Input: ``doc_id, source, text`` with real paragraph (``\\n\\n``)
    and line (``\\n``) structure.  ~6 shuffles total: paragraph
    df-count + two reassemblies + the md5 dedup window + per-source
    rollups (joined on the tiny source key).
    """
    p, c, flagged = curation_stages(docs)
    return curation_manifest(p, c, flagged)


def curation_stages(docs: DataFrame):
    """The rule stages + dedup flagging shared by the batch pipeline
    and the streaming foreachBatch driver (`streaming/curation.py`).
    Returns (p, c, flagged); p and c are cached — each feeds a stage
    rollup AND the next stage."""
    p = paragraph_dedup(docs, carry=("source",)).cache()
    c_in = p.select(
        "doc_id", "source", "n_removed",
        F.regexp_replace("clean_text", r"\n\n", "\n").alias("text"))
    c = c4_line_filter(c_in, carry=("source", "n_removed")).cache()
    survivors = c.filter("doc_kept").select(
        "doc_id", "source", F.col("clean_text").alias("text"))
    g = gopher_rules(survivors, carry=("source", "text"))
    w = Window.partitionBy(F.md5("text")).orderBy(
        F.col("keep").desc(), F.col("doc_id"))
    flagged = g.withColumn("_rn", F.row_number().over(w)).withColumn(
        "is_winner", F.col("keep") & (F.col("_rn") == 1))
    return p, c, flagged


def curation_manifest(p: DataFrame, c: DataFrame,
                      flagged: DataFrame) -> DataFrame:
    """Per-source audit manifest over the stage outputs."""
    s0 = p.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_removed").alias("paras_removed"))
    s1 = c.groupBy("source").agg(
        F.sum(F.col("doc_kept").cast("long")).alias("n_after_c4"))
    s2 = flagged.groupBy("source").agg(
        F.sum(F.col("keep").cast("long")).alias("n_after_rules"),
        F.sum(F.col("is_winner").cast("long")).alias("n_final"),
        F.sum(F.when(F.col("is_winner"), F.col("word_count"))
              .otherwise(F.lit(0))).alias("tokens_final"))
    out = s0.join(s1, "source", "left").join(s2, "source", "left")
    return out.select(
        "source", "n_docs", "paras_removed", "n_after_c4",
        *[F.coalesce(c_, F.lit(0)).cast("long").alias(n) for c_, n in
          [(F.col("n_after_rules"), "n_after_rules"),
           (F.col("n_final"), "n_final"),
           (F.col("tokens_final"), "tokens_final")]],
    )
