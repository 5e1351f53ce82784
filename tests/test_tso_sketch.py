"""TSO bit-algebra roundtrip and HLL sketch properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from ticdc_spark.functions.sketch import (
    HLL_M,
    HLL_RHO_MAX,
    hll_cell,
    hll_estimate,
)
from ticdc_spark.functions.tso import (
    TSO_LOGICAL_MASK,
    compose_tso,
    tso_logical,
    tso_physical_ms,
)


def test_tso_roundtrip(spark):
    df = spark.range(1000).select(
        (F.col("id") * 9999991 + 1_700_000_000_000).alias("phys"),
        (F.col("id") * 7919 % (TSO_LOGICAL_MASK + 1)).alias("logical"),
    )
    rt = df.select(
        "phys", "logical",
        compose_tso(F.col("phys"), F.col("logical")).alias("tso"),
    ).select(
        (tso_physical_ms(F.col("tso")) == F.col("phys")).alias("p_ok"),
        (tso_logical(F.col("tso")) == F.col("logical")).alias("l_ok"),
    )
    bad = rt.filter(~F.col("p_ok") | ~F.col("l_ok")).count()
    assert bad == 0


def test_hll_registers_merge_associatively(spark):
    """Sketch state merged from two halves == sketch of the union —
    the property that makes the fold map-side combinable at 100 TB."""
    vals = spark.range(5000).select(F.col("id").alias("v"))
    a = vals.filter(F.col("v") % 2 == 0)
    b = vals.filter(F.col("v") % 2 == 1)

    def regs(df):
        reg, rho = hll_cell(F.col("v"))
        return df.select(reg, rho).groupBy("reg").agg(F.max("rho").alias("max_rho"))

    merged = (
        regs(a).unionByName(regs(b))
        .groupBy("reg").agg(F.max("max_rho").alias("max_rho"))
    )
    whole = regs(vals)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_estimate_accuracy(spark):
    """Standard error for m=256 is ~1.04/sqrt(256) = 6.5%; assert 3 sigma."""
    n = 20_000
    vals = spark.range(n).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    reg, rho = hll_cell(F.col("v"))
    regs = vals.select("g", reg, rho).groupBy("g", "reg").agg(
        F.max("rho").alias("max_rho")
    )
    est = hll_estimate(regs, ["g"]).collect()[0]["est"]
    assert abs(est - n) / n < 0.20
    assert 1 <= est  # sanity: rho bounded by suffix width
    assert HLL_RHO_MAX == 41 and HLL_M == 256  # constants the oracle embeds


def test_cms_never_underestimates(spark):
    """The Count-Min guarantee: est(k) >= true count for every key."""
    from ticdc_spark.functions.sketch import cms_counters, cms_estimate

    df = spark.range(8000).select((F.col("id") % 97).alias("k"))
    counters = cms_counters(df, F.col("k"))
    exact = df.groupBy("k").count()
    est = cms_estimate(counters, exact.select("k"), "k")
    joined = exact.join(est, "k")
    under = joined.filter(F.col("cms_est") < F.col("count")).count()
    assert under == 0
    # and the grid never exceeds d*w cells
    from ticdc_spark.functions.sketch import CMS_D, CMS_W
    assert counters.count() <= CMS_D * CMS_W


def test_position_inertia_matches_go_model(spark):
    """Independent model of pkg/hash/position_inertia.go using
    binascii.crc32 — pins the Spark column algebra to the Go bytes."""
    import binascii

    from ticdc_spark.functions.crc32_sql import position_inertia

    rows = [("test", "tp_click", 42), ("test", "tp_view", None),
            ("prod", "orders", 7)]
    df = spark.createDataFrame(rows, "s string, t string, v long")
    val = F.col("v").cast("string")
    h_tbl = position_inertia(F.concat("s", "t"))
    h_col = position_inertia(F.concat(F.lit("id"), val))
    h = F.when(val.isNull(), h_tbl).otherwise(h_tbl.bitwiseXOR(h_col))
    got = {(r["s"], r["t"]): r["h"]
           for r in df.select("s", "t", h.alias("h")).collect()}
    for s, t, v in rows:
        want = binascii.crc32((s + t).encode())
        if v is not None:
            want ^= binascii.crc32(f"id{v}".encode())
        assert got[(s, t)] == want, (s, t)


def test_route_with_inertia_hasher(spark, sf_dir):
    """Dispatcher config {"hasher": "inertia"} routes with the
    reference partition numbers (same values as the oracle query)."""
    from ticdc_spark.operators.routing import route
    from ticdc_spark.queries import QUERIES
    from ticdc_spark.sources.changelog import events_changelog

    cl = events_changelog(spark, sf_dir)
    routed = route(cl, [{"matcher": ["*.*"], "partition": "index-value",
                         "hasher": "inertia"}], n_partitions=16)
    got = routed.select("table_name", "pk", "seq", "partition")
    want = QUERIES["partition_inertia_index_value"](spark, sf_dir) \
        .select("table_name", "pk", "seq",
                F.col("partition").cast("int").alias("partition"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_cms_unseen_key_estimates_zero_or_collision(spark):
    """A key never inserted must estimate 0 unless ALL d of its cells
    collide with inserted keys (the left-join zero-counter rule)."""
    from ticdc_spark.functions.sketch import cms_counters, cms_estimate

    df = spark.range(100).select(F.col("id").alias("k"))
    counters = cms_counters(df, F.col("k"))
    probe = spark.range(1_000_000, 1_000_050).select(F.col("id").alias("k"))
    est = cms_estimate(counters, probe, "k")
    # with 400 filled cells of 2048, most unseen keys hit >=1 empty cell
    zeros = est.filter(F.col("cms_est") == 0).count()
    assert zeros >= 40, zeros
