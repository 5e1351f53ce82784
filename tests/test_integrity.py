"""P5 integrity: checksum verification catches corruption; compressed
sink files round-trip."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from ticdc_spark.operators.checksum import verify_checksums, with_row_checksum
from ticdc_spark.pipeline import ChangefeedConfig
from ticdc_spark.sources.changelog import events_changelog
from ticdc_spark.streaming import Changefeed


def test_checksum_verification_catches_corruption(spark, sf_dir):
    cl = with_row_checksum(events_changelog(spark, sf_dir).limit(500))
    # uncorrupted: everything verifies
    ok = verify_checksums(cl)
    assert ok.filter(~F.col("checksum_ok")).count() == 0
    # corrupt the after.val of rows with seq % 7 == 0 AFTER checksumming
    corrupted = cl.withColumn(
        "after",
        F.when(
            (F.col("seq") % 7 == 0) & F.col("after").isNotNull(),
            F.struct(
                F.col("after.id").alias("id"),
                (F.col("after.val") + 1000.0).alias("val"),
                F.col("after.k").alias("k"),
            ),
        ).otherwise(F.col("after")),
    )
    flagged = verify_checksums(corrupted).filter(~F.col("checksum_ok"))
    expected = corrupted.filter(
        (F.col("seq") % 7 == 0) & F.col("after").isNotNull()
    ).count()
    assert flagged.count() == expected > 0


def test_compressed_sink(spark, sf_dir, tmp_path):
    cf = Changefeed(
        "cf_gz", ChangefeedConfig(protocol="csv", split_updates=False),
        str(tmp_path), compression="gzip",
    )
    cf.start(spark, sf_dir, available_now=True)
    cf.wait(240)
    gz = glob.glob(f"{cf.sink_dir}/**/*.gz", recursive=True)
    assert gz, "no compressed files written"
    n = spark.read.json(f"{cf.sink_dir}/epoch=*").count()
    assert n == events_changelog(spark, sf_dir).count()


def test_large_message_compression_roundtrip(spark, sf_dir):
    """`pkg/compression`-style payload compression: compress → decompress
    restores the exact message bytes, NULLs pass through, shrinkage is
    real on repetitive payloads; unknown codec raises."""
    import pytest

    from ticdc_spark.codec import encode_canal_json
    from ticdc_spark.operators.large_message import (
        compress_values,
        decompress_values,
    )

    enc = encode_canal_json(events_changelog(spark, sf_dir).limit(300)).select(
        "seq", "value"
    )
    for codec in ("zlib", "lzma"):
        comp = compress_values(enc, codec=codec)
        sizes = comp.select(
            F.sum(F.length("value")).alias("c"),
        ).collect()[0]
        orig = enc.select(F.sum(F.length("value")).alias("o")).collect()[0]
        assert sizes["c"] < orig["o"]  # canal JSON is highly compressible
        back = decompress_values(comp, codec=codec)
        diff = (
            back.alias("b")
            .join(enc.alias("o"), "seq")
            .filter(F.col("b.value") != F.col("o.value"))
            .count()
        )
        assert diff == 0
        assert back.count() == 300
    # NULL passthrough
    nulled = enc.withColumn(
        "value", F.when(F.col("seq") % 2 == 0, F.col("value"))
    )
    back = decompress_values(compress_values(nulled), codec="zlib")
    assert back.filter(F.col("value").isNull()).count() == nulled.filter(
        F.col("value").isNull()
    ).count()
    with pytest.raises(ValueError):
        compress_values(enc, codec="zstd-not-here")
