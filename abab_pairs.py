"""ABAB for the round-9 pair-generation restructures (prefix-filtered
candidates + single-exchange inverted buckets).

A = r08 bodies (inlined below: exploded self-joins / anti-join guard).
B = current module code (prefix filter + _bucket_pairs).

Runs each affected query old-vs-new alternated, noop-sink timed,
steal-logged.  Result equality is separately pinned by the oracle
sweep; this script is the wall evidence.

Usage: SPARK_GRAFT_SF_DIR=<dir> python abab_pairs.py [n]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from ticdc_spark.session import get_spark  # noqa: E402
from ticdc_spark.llm.dedup import (  # noqa: E402
    MAX_BUCKET_OCCUPANCY,
    _doc_shingles,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_pruned,
)
from ticdc_spark.llm.text import tokens_col  # noqa: E402


# ---- r08 bodies, inlined verbatim ----------------------------------------

def ngram_jaccard_pairs_old(docs, threshold=0.8):
    sh = _doc_shingles(docs).cache()
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"),
                 F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("n_inter")))
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "a_id").join(sb, "b_id")
        .withColumn("jaccard", F.round(
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "n_inter", "jaccard"))


def ngram_jaccard_pairs_pruned_old(docs, threshold=0.8, max_df_frac=0.02):
    sh = _doc_shingles(docs).cache()
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    tot = F.broadcast(sh.filter(F.size("shingles") > 0).agg(
        F.count(F.lit(1)).alias("n_docs")))
    hot = (ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
           .crossJoin(tot)
           .filter(F.col("df") > F.col("n_docs") * max_df_frac).select("s"))
    kept = ex.join(F.broadcast(hot), "s", "left_anti").cache()
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = kept.alias("a"), kept.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"),
                 F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("n_inter")))
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "a_id").join(sb, "b_id")
        .withColumn("jaccard", F.round(
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "n_inter", "jaccard"))


def minhash_lsh_pairs_old(docs, threshold=0.8, max_bucket=MAX_BUCKET_OCCUPANCY):
    from ticdc_spark.llm.dedup import N_BANDS
    sh_cached = _doc_shingles(docs).cache()
    sig = minhash_signature(docs, _shingles=sh_cached)
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket"))
            for b in range(N_BANDS)])).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    hot = (bands.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("occ"))
           .filter(F.col("occ") > max_bucket).select("band", "bucket"))
    bands = bands.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"))
        .distinct())
    sa = sh_cached.select(F.col("doc_id").alias("a_id"),
                          F.col("shingles").alias("sh_a"))
    sb = sh_cached.select(F.col("doc_id").alias("b_id"),
                          F.col("shingles").alias("sh_b"))
    return (
        cand.join(sa, "a_id").join(sb, "b_id")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard", F.round(
            F.col("n_inter")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "n_inter", "jaccard"))


def source_overlap_matrix_old(docs, w=8):
    toks = docs.select("source", tokens_col(F.col("text")).alias("t"))
    grams = (
        toks.withColumn("n_toks", F.size("t"))
        .filter(F.col("n_toks") >= w)
        .select("source", F.explode(F.transform(
            F.sequence(F.lit(0), F.col("n_toks") - w),
            lambda i: F.concat_ws(" ", F.slice("t", i + 1, w)))).alias("gram"))
        .distinct())
    totals = grams.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(b, (F.col("a.gram") == F.col("b.gram"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"),
                 F.col("b.source").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("n_shared")))
    ta = totals.select(F.col("source").alias("src_a"),
                       F.col("n_grams").alias("n_a"))
    tb = totals.select(F.col("source").alias("src_b"),
                       F.col("n_grams").alias("n_b"))
    return (
        shared.join(F.broadcast(ta), "src_a").join(F.broadcast(tb), "src_b")
        .select("src_a", "src_b", "n_shared", "n_a", "n_b",
                F.round(F.col("n_shared") / F.least("n_a", "n_b"), 6)
                .alias("overlap")))


def source_overlap_matrix_inverted_rejected(docs, w=8):
    """The one-exchange inverted shape — measured 0.76x at sf1 and
    REJECTED (w-grams are mostly unique; collect_set rides
    ObjectHashAggregate's sort-based fallback).  Kept here so the
    negative result stays reproducible."""
    from ticdc_spark.llm.dedup import _bucket_pairs
    toks = docs.select("source", tokens_col(F.col("text")).alias("t"))
    grams = (
        toks.withColumn("n_toks", F.size("t"))
        .filter(F.col("n_toks") >= w)
        .select("source", F.explode(F.transform(
            F.sequence(F.lit(0), F.col("n_toks") - w),
            lambda i: F.concat_ws(" ", F.slice("t", i + 1, w)))).alias("gram")))
    buckets = grams.groupBy("gram").agg(
        F.sort_array(F.collect_set("source")).alias("_ds"))
    totals = (buckets.select(F.explode("_ds").alias("source"))
              .groupBy("source").agg(F.count(F.lit(1)).alias("n_grams")))
    shared = (_bucket_pairs(buckets)
              .groupBy(F.col("a").alias("src_a"), F.col("b").alias("src_b"))
              .agg(F.count(F.lit(1)).alias("n_shared")))
    ta = totals.select(F.col("source").alias("src_a"),
                       F.col("n_grams").alias("n_a"))
    tb = totals.select(F.col("source").alias("src_b"),
                       F.col("n_grams").alias("n_b"))
    return (
        shared.join(F.broadcast(ta), "src_a").join(F.broadcast(tb), "src_b")
        .select("src_a", "src_b", "n_shared", "n_a", "n_b",
                F.round(F.col("n_shared") / F.least("n_a", "n_b"), 6)
                .alias("overlap")))


PAIRS = [
    ("dedup_ngram_jaccard", ngram_jaccard_pairs_old, ngram_jaccard_pairs),
    ("dedup_ngram_jaccard_pruned", ngram_jaccard_pairs_pruned_old,
     ngram_jaccard_pairs_pruned),
    ("dedup_minhash_lsh", minhash_lsh_pairs_old, minhash_lsh_pairs),
    ("source_overlap_matrix_inverted_rejected", source_overlap_matrix_old,
     source_overlap_matrix_inverted_rejected),
]


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "spark-warehouse/sf1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ticdc_abab_pairs")
    from ticdc_spark.llm_queries import _docs
    from ticdc_spark.sources.changelog import events_changelog

    events_changelog(spark, "/root/testdata/sf0.1").count()
    spark.range(10000).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode(
        "overwrite").save()

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(_docs(spark, sf_dir)).write.format("noop").mode(
            "overwrite").save()
        spark.catalog.clearCache()
        return round(time.perf_counter() - t0, 3)

    out = {}
    s0 = steal()
    for name, old, new in PAIRS:
        run(old); run(new)  # warm
        a, b = [], []
        for _ in range(n):
            a.append(run(old))
            b.append(run(new))
        out[name] = {"A_old": a, "B_new": b,
                     "A_min": min(a), "B_min": min(b),
                     "speedup_min": round(min(a) / min(b), 3),
                     "A_median": statistics.median(a),
                     "B_median": statistics.median(b)}
        print(f"{name}: old min {min(a):.3f} / new min {min(b):.3f} "
              f"({out[name]['speedup_min']}x)", flush=True)
    print(json.dumps({"samples": n, "sf_dir": sf_dir,
                      "steal_jiffies_delta": steal() - s0,
                      "per_query": out}))


if __name__ == "__main__":
    main()
