"""Large-message handling (SURVEY §2.11): handle-key-only + claim-check.

Reference: `pkg/config/large_message.go:22-35` — when an encoded message
exceeds ``max-message-bytes`` (10 MiB default, `pkg/config/sink.go:35`),
either strip it to primary-key columns (``handle-key-only``) or park the
payload externally and send a pointer (``claim-check``,
`pkg/sink/kafka/claimcheck/`).

Spark-first: a conditional re-encode — ``when(length(value) > max, small
variant)``. The claim-check pointer is a deterministic location derived
from (topic, commit_ts, seq); the actual external write happens in
foreachBatch (filter the oversized rows, write them to the claim store,
then send pointers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_handle_key_only(
    cl_encoded: DataFrame,
    encode_small: Callable[[DataFrame], DataFrame],
    max_bytes: int,
) -> DataFrame:
    """Replace oversized ``value`` messages with the handle-key-only
    encoding produced by ``encode_small`` (which must add ``value``)."""
    small = encode_small(cl_encoded.drop("value")).select(
        F.col("seq").alias("_s_seq"), F.col("value").alias("_small_value")
    )
    out = cl_encoded.join(small, cl_encoded["seq"] == small["_s_seq"], "left")
    return (
        out.withColumn("is_large", F.length("value") > max_bytes)
        .withColumn(
            "value",
            F.when(F.col("is_large"), F.col("_small_value")).otherwise(F.col("value")),
        )
        .drop("_s_seq", "_small_value")
    )


def with_claim_check(
    cl_encoded: DataFrame, max_bytes: int, claim_store_uri: str = "s3://claims"
) -> DataFrame:
    """Oversized messages become pointers: ``{"claimCheckLocation": …}``;
    the payload rows are flagged for the external write."""
    location = F.concat(
        F.lit(claim_store_uri + "/"),
        F.col("schema_name"), F.lit("/"), F.col("table_name"), F.lit("/"),
        F.col("commit_ts").cast("string"), F.lit("-"),
        F.col("seq").cast("string"), F.lit(".json"),
    )
    is_large = F.length("value") > max_bytes
    return (
        cl_encoded.withColumn("is_large", is_large)
        .withColumn("claim_location", F.when(is_large, location))
        .withColumn(
            "value",
            F.when(
                is_large,
                F.concat(F.lit('{"claimCheckLocation":"'), location, F.lit('"}')),
            ).otherwise(F.col("value")),
        )
    )
