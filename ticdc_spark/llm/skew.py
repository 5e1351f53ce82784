"""Skewed synthetic corpora for skew-robustness evidence.

Every scale artifact so far (10x/30x/100x blocks, sf1 sweep) draws keys
near-uniformly — but real corpora are Zipfian: one viral document
duplicated millions of times, one hot account owning a double-digit
percentage of a changelog. These generators build deliberately-skewed
inputs so the skew guards (salted compaction fold, LSH hot-bucket
anti-join) can be measured against the unguarded paths on the
distribution they exist for, not just asserted.

Both generators are pure column algebra over ``spark.range`` — fully
distributed, deterministic (hash-derived, no RNG), and size-parametric,
so the same code can build a 100 TB skew corpus on a real cluster.

Reference provenance: skew handling maps to the reference's span
splitting (logservice/schemastore + maintainer split/merge,
SURVEY.md R7) and the MQ partition dispatchers' hot-key spreading;
the LSH bucket cap is the standard hot-bucket guard from the MinHash
dedup literature (see PAPERS.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def skewed_changelog(
    spark: SparkSession,
    n_rows: int = 600_000,
    hot_frac: float = 0.2,
    n_keys: int | None = None,
) -> DataFrame:
    """Changelog (same shape as ``events_changelog``) where one hot pk
    owns ``hot_frac`` of all rows and the rest spread uniformly over
    ``n_keys`` keys — the "one account is 20% of the write traffic"
    distribution.

    commit_ts == 1e9 + seq is unique (the compaction fold's associativity
    requirement), ops cycle I/U/D, and the before/after images carry the
    same (id, val, k) payload struct as the events changelog so every
    compaction/ordering operator accepts the output unchanged.
    """
    n_keys = n_keys or max(1_000, n_rows // 10)
    hot_cut = int(n_rows * hot_frac)
    seq = F.col("seq")
    pk = (
        F.when(seq < hot_cut, F.lit(0))
        .otherwise(F.pmod(F.xxhash64(seq), F.lit(n_keys)) + 1)
        .cast("long")
    )
    code = (seq % 3).cast("int")  # 0=I 1=U 2=D
    op = (
        F.when(code == 0, F.lit("I"))
        .when(code == 1, F.lit("U"))
        .otherwise(F.lit("D"))
    )
    dml_order = (
        F.when(code == 2, F.lit(1)).when(code == 1, F.lit(2)).otherwise(F.lit(3))
    ).cast("int")
    commit_ts = (F.lit(1_000_000_000) + seq).cast("long")
    val = (seq % 1_000).cast("double")
    k = (seq % 7).cast("long")
    image = lambda v: F.struct(pk.alias("id"), v.alias("val"), k.alias("k"))  # noqa: E731
    return (
        spark.range(n_rows)
        .select(F.col("id").alias("seq"))
        .select(
            F.lit("test").alias("schema_name"),
            F.lit("tp_skew").alias("table_name"),
            F.lit(1).cast("long").alias("table_id"),
            op.alias("op"),
            commit_ts.alias("commit_ts"),
            (commit_ts - 1).alias("start_ts"),
            seq.alias("seq"),
            dml_order.alias("dml_order"),
            pk.alias("pk"),
            F.when(op.isin("U", "D"), image(val + F.lit(1.0))).alias("before"),
            F.when(op.isin("I", "U"), image(val)).alias("after"),
        )
    )


#: default power-law cluster spec: (cluster_size, n_clusters) pairs.
#: One viral 1500-copy cluster + a heavy tail — the distribution where
#: an unguarded LSH band self-join goes quadratic on the hot bucket.
POWERLAW_SPEC: tuple[tuple[int, int], ...] = ((1500, 1), (150, 10), (15, 100))


def powerlaw_documents(
    spark: SparkSession,
    cluster_spec: tuple[tuple[int, int], ...] = POWERLAW_SPEC,
    n_singletons: int = 2_000,
) -> DataFrame:
    """Documents whose near-duplicate cluster sizes follow a power law.

    Each cluster's members share a 30-token base text (hash-derived from
    the cluster id) plus one member-unique suffix token, so intra-cluster
    3-gram Jaccard is ~28/32 — above the 0.8 LSH threshold — while
    inter-cluster similarity is ~0. Returns (doc_id, text, lang, source,
    n_chars) like the driver's documents table.

    The cluster spec is a bounded control-plane list (a few thousand
    (cluster_id, size) rows); the member explosion and text synthesis are
    distributed column algebra, so the generator scales with cluster
    COUNT, not corpus size.
    """
    spec_rows: list[tuple[int, int]] = []
    cid = 0
    for size, count in cluster_spec:
        for _ in range(count):
            spec_rows.append((cid, size))
            cid += 1
    for _ in range(n_singletons):
        spec_rows.append((cid, 1))
        cid += 1
    clusters = spark.createDataFrame(spec_rows, "cluster_id long, size int")
    members = clusters.select(
        "cluster_id",
        F.explode(F.sequence(F.lit(0), F.col("size") - 1)).alias("m"),
    ).repartition(spark.sparkContext.defaultParallelism)
    base_text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(29)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("cluster_id") * 100 + i), F.lit(5_000)),
            ),
        ),
        " ",
    )
    text = F.concat(
        base_text,
        F.lit(" uniq"),
        F.col("cluster_id"),
        F.lit("x"),
        F.col("m"),
    )
    return members.select(
        (F.col("cluster_id") * 100_000 + F.col("m")).alias("doc_id"),
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.lit("skewgen").alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )
