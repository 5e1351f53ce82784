"""A4 — conflict-detector slot hashing.

Reference: `downstreamadapter/sink/mysql/causality/conflict_detector.go:
30-141` + `slot.go` — transactions hash by their affected keys into
slots; same-slot txns serialize, different slots run parallel.

Spark-first: ``repartition(n_slots, slot)`` before the sink foreachBatch
gives per-partition serial / cross-partition parallel writes for free.
The slot is the portable FNV-1a of the handle key — equal keys always
land in the same slot, preserving per-key order through parallelism
(SURVEY §7.3's ordering invariant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ticdc_spark.operators.routing import hash32_md5


def slot_col(n_slots: int = 16) -> Column:
    key = F.coalesce(F.col("after.id"), F.col("before.id")).cast("string")
    return (hash32_md5(key) % n_slots).cast("int")


def with_conflict_slots(cl: DataFrame, n_slots: int = 16) -> DataFrame:
    return cl.withColumn("slot", slot_col(n_slots))


def partition_by_slots(cl: DataFrame, n_slots: int = 16) -> DataFrame:
    """Physical clustering for the sink: one Spark partition per slot."""
    return with_conflict_slots(cl, n_slots).repartition(n_slots, "slot")
