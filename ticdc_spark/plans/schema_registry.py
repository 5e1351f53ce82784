"""S5/J1 — versioned schema registry + as-of (temporal) schema binding.

Reference: the SchemaStore keeps every historical TableInfo version and
answers ``GetTableInfo(tableID, ts)`` = "largest version ≤ ts"
(`logservice/schemastore/schema_store.go:50-54`, multi-version store
`multi_version.go`); every scanned DML binds to its schema version
(`pkg/eventservice/event_scanner.go:351`), and the storage sink embeds
``tableVersion`` in paths (`dml_event.go:399-403`).

Spark-first: the registry is a small dimension DataFrame
(table_id, version_ts, version, schema_json) — **broadcast** as-of join:
equi-join on table_id (broadcast, no shuffle of the fact side), filter
``version_ts <= commit_ts``, keep the max version via ``max_by`` over a
window-free groupBy… except that would shuffle. Cheaper at scale: join +
filter + ``max_by`` grouped by the fact row's unique key is avoidable
entirely when the registry is small: broadcast the *sorted version list
per table* and resolve with an array expression (binary-search-free
``filter + array_max``) — zero shuffle, pure map.

Both strategies are provided; the query registry uses the map-side one
(`bind` = array lookup), which is the 100 TB-safe plan.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Deterministic synthetic registry: every table has three schema versions
# activated at fixed UTC instants (µs). Versions are global constants so
# the DuckDB oracle can embed them as literals.
SCHEMA_VERSIONS: list[tuple[int, int]] = [
    (1, 0),                       # v1 from the epoch
    (2, 1_706_745_600_000_000),   # v2 from 2024-02-01
    (3, 1_711_929_600_000_000),   # v3 from 2024-04-01
]


def schema_registry_df(spark: SparkSession, table_ids: list[int]) -> DataFrame:
    rows = []
    for tid in table_ids:
        for version, vts in SCHEMA_VERSIONS:
            rows.append((
                tid, version, vts,
                json.dumps({"table_id": tid, "version": version,
                            "columns": ["id", "val", "k"]}),
            ))
    return spark.createDataFrame(
        rows, "table_id long, version int, version_ts long, schema_json string"
    )


def asof_bind_schema(cl: DataFrame, registry: DataFrame | None = None) -> DataFrame:
    """Attach ``schema_version`` = max version with version_ts <= commit_ts.

    Map-side resolution: the (tiny) version list becomes an array literal
    filtered per row — no join, no shuffle. With a per-table registry
    DataFrame, the same is achieved by ``F.broadcast(registry)`` +
    groupBy max_by (provided for the general case in
    ``asof_bind_schema_join``)."""
    pairs = sorted(SCHEMA_VERSIONS, key=lambda p: p[1])
    versions = F.array(*[
        F.struct(F.lit(v).alias("version"), F.lit(ts).alias("version_ts"))
        for v, ts in pairs
    ])
    applicable = F.filter(versions, lambda s: s["version_ts"] <= F.col("commit_ts"))
    bound = F.array_max(F.transform(applicable, lambda s: s["version"]))
    return cl.withColumn("schema_version", bound)


def asof_bind_schema_join(cl: DataFrame, registry: DataFrame) -> DataFrame:
    """General as-of join form: broadcast registry, filter, max_by.

    The groupBy is keyed by the fact row identity (table_id, seq) so the
    shuffle is on the fact side — use only when the registry is too big
    or too dynamic for the literal-array strategy."""
    joined = cl.join(
        F.broadcast(registry.select("table_id", "version", "version_ts")),
        "table_id",
    ).filter(F.col("version_ts") <= F.col("commit_ts"))
    keys = [c for c in cl.columns]
    return joined.groupBy(*keys).agg(
        F.max_by("version", "version_ts").alias("schema_version")
    )
