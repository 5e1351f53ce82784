"""Web-corpus curation operators (llm/web.py): hand-built edge cases
the documents fixture can't produce, plus plan budgets."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plan_quality import _plan
from ticdc_spark.llm.web import (
    c4_line_filter,
    gopher_rules,
    normalize_url,
    paragraph_dedup,
    url_dedup,
)
from ticdc_spark.queries import QUERIES


def _norm_one(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(normalize_url("url").alias("n")).collect()[0]["n"]


def test_normalize_url_rules(spark):
    cases = [
        # fragment, case, www, default port, tracking params, sort
        ("HTTP://WWW.Ex.COM:80/A/b/?utm_source=x&b=2&a=1#frag",
         "http://ex.com/A/b?a=1&b=2"),
        # https default port; non-default port kept
        ("https://ex.com:443/p", "https://ex.com/p"),
        ("https://ex.com:8443/p", "https://ex.com:8443/p"),
        # :80 is NOT default for https
        ("https://ex.com:80/p", "https://ex.com:80/p"),
        # no query, trailing slashes collapse
        ("http://ex.com/a///", "http://ex.com/a"),
        # only tracking params -> no '?'
        ("http://ex.com/a?utm_campaign=z&ref=feed&fbclid=1&gclid=2",
         "http://ex.com/a"),
        # bare host, empty path
        ("http://Ex.com", "http://ex.com"),
        # param name prefixed by (not equal to) a tracking name survives
        ("http://ex.com/?refresh=1&utm=keepme", "http://ex.com?refresh=1&utm=keepme"),
        # valueless tracking param dropped
        ("http://ex.com/?ref&x=1", "http://ex.com?x=1"),
    ]
    for raw, want in cases:
        assert _norm_one(spark, raw) == want, raw


def test_url_dedup_keeps_min_doc_id(spark):
    rows = [
        (1, "http://a.com/x?utm_source=1", "s1"),
        (7, "HTTP://WWW.A.COM:80/x#f", "s2"),
        (3, "http://b.com/y", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, source string")
    out = {r["norm_url"]: r for r in url_dedup(df).collect()}
    assert out["http://a.com/x"]["keep_doc_id"] == 1
    assert out["http://a.com/x"]["n_docs"] == 2
    assert out["http://a.com/x"]["n_sources"] == 2
    assert out["http://b.com/y"]["n_docs"] == 1


def test_paragraph_dedup_order_and_all_removed(spark):
    boiler = "cookie banner"
    rows = ([(i, f"{boiler}\n\nunique para {i}\n\nsecond {i}") for i in range(10)]
            + [(99, boiler)])  # doc that is ONLY boilerplate
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert len(out) == 11  # every input doc present
    assert out[3]["n_paras"] == 3 and out[3]["n_removed"] == 1
    # original order preserved after removal
    assert out[3]["clean_text"] == "unique para 3\n\nsecond 3"
    assert out[99]["n_removed"] == 1 and out[99]["clean_text"] == ""


def test_c4_line_filter_rules(spark):
    good = "one two three four five six seven."
    rows = [
        # kept doc: 3 good lines, 1 short, 1 unpunctuated
        (1, f"{good}\nshort line.\n{good}\none two three four five six\n{good}"),
        # dropped: lorem ipsum marker
        (2, f"{good}\nlorem ipsum dolor sit amet.\n{good}\n{good}"),
        # dropped: curly brace
        (3, f"{good}\nvar x = {{}};\n{good}\n{good}"),
        # dropped: only 2 kept lines
        (4, f"{good}\n{good}\nno punct here at all"),
        # javascript/cookie lines dropped but doc survives
        (5, f"{good}\nplease enable javascript today ok now.\n{good}\n{good}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert out[1]["doc_kept"] and out[1]["n_kept"] == 3
    assert out[1]["clean_text"] == "\n".join([good, good, good])
    assert not out[2]["doc_kept"] and out[2]["clean_text"] is None
    assert not out[3]["doc_kept"]
    assert not out[4]["doc_kept"] and out[4]["n_kept"] == 2
    assert out[5]["doc_kept"] and out[5]["n_kept"] == 3


def test_gopher_rules_metrics(spark):
    text_ok = " ".join(["alpha beta gamma delta epsilon"] * 10) + " the a of"
    text_sym = "the a " + " ".join(["#"] * 20) + " " + " ".join(["word"] * 40)
    df = spark.createDataFrame(
        [(1, text_ok), (2, text_sym), (3, "the a")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert out[1]["keep"] and out[1]["word_count"] == 53
    assert out[1]["n_stopwords"] == 3
    # 20 '#' of 62 words = 322/1000 symbol ratio -> fails symbols+alpha
    assert out[2]["word_count"] == 62
    assert out[2]["sym_ratio_m"] == 322 and not out[2]["r_symbols"]
    assert not out[2]["r_alpha"] and not out[2]["keep"]
    assert not out[3]["r_word_count"]  # too short
    # mean word length: 'the a' -> 4 chars content /2 words -> 200
    assert out[3]["mean_word_len_c"] == 200 and not out[3]["r_mean_len"]


def test_web_operator_shuffle_budgets(spark, sf_dir):
    """url_normalize/gopher_rules are map-only; url_dedup groups on the
    canonical URL — the exact count(DISTINCT source) expands to the
    standard two-phase distinct aggregate (partial by (url, source),
    merge by url), both map-side-combined, so 2 exchanges is the right
    scalable plan, not a regression; paragraph_dedup pays the df-count
    shuffle + the doc reassembly (boilerplate join is broadcast);
    c4_line_filter pays only the doc reassembly."""
    budgets = [
        ("url_normalize", 0),
        ("gopher_rules", 0),
        ("url_dedup", 2),
        # paragraph_dedup: (para,doc_id) distinct + para merge (the
        # exact doc-frequency two-phase), a 1-row corpus total, and the
        # doc_id reassembly; the first three feed the broadcast side
        ("paragraph_dedup", 4),
        ("c4_line_filter", 1),
        # md5 window + per-source rollup
        ("curation_pipeline", 2),
    ]
    for name, budget in budgets:
        p = _plan(QUERIES[name](spark, sf_dir))
        shuffles = p.count("Exchange") - p.count("BroadcastExchange")
        assert shuffles <= budget, f"{name}: {shuffles} > {budget}\n{p}"
    # the boilerplate set must reach the join as a broadcast
    p = _plan(QUERIES["paragraph_dedup"](spark, sf_dir))
    assert "BroadcastExchange" in p


def test_gopher_rules_case_insensitive(spark):
    """Capitalized prose must not be discarded: 'The'/'A' count as
    stopwords and all-caps words as alphabetic."""
    text = "The Quick Brown Fox Jumps Over A NASA Program " \
        + " ".join(["Word"] * 45)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = gopher_rules(df).collect()[0]
    assert r["n_stopwords"] == 2      # the, a (case-folded)
    assert r["alpha_ratio_m"] == 1000  # every word is alphabetic
    assert r["r_stopwords"] and r["r_alpha"]


def test_normalize_url_idempotent(spark):
    """Canonicalization must be a projection: normalize(normalize(u))
    == normalize(u) over a generated URL space (schemes x www x ports
    x paths x param mixes x fragments)."""
    rows = []
    i = 0
    for scheme in ("http", "HTTPS"):
        for host in ("Ex.COM", "www.sub.ex.com", "ex.com:8080",
                     "EX.com:443"):
            for path in ("", "/", "/A/b/", "/x"):
                for q in ("", "?b=2&a=1", "?utm_source=x&z=9#f",
                          "?ref&q=a+b#frag"):
                    rows.append((i, f"{scheme}://{host}{path}{q}"))
                    i += 1
    df = spark.createDataFrame(rows, "i long, url string")
    once = df.select("i", normalize_url("url").alias("n1"))
    twice = once.select(
        "i", "n1", normalize_url("n1").alias("n2"))
    bad = twice.filter(F.col("n1") != F.col("n2")).collect()
    assert not bad, bad[:5]
