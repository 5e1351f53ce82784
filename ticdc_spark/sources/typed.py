"""Per-table TYPED changelog — real per-table schemas bound through the
versioned schema registry (closes the round-1 "unified payload" gap).

The reference mounts every table with its OWN TableInfo columns
(`pkg/common/event/mounter.go:44-151`; `pkg/common/table_info.go:79-117`),
and every DML binds to the schema version with largest ``version_ts <=
commit_ts`` (`logservice/schemastore/schema_store.go:50-54`). Columns
added by a later DDL simply do not exist in rows mounted at an earlier
version — this module reproduces exactly that: the ``orders`` table gets
a typed payload struct (bigint/bigint/double/varchar/varchar/date-string)
whose ``status`` column exists from schema v2 and ``priority`` from v3
(`SCHEMA_VERSIONS` in plans/schema_registry.py).

Event derivation (deterministic, mirrored in ``ORDERS_CL_SQL``):

- every order row yields an INSERT at ``ts0 = 2024-01-01 + okey*4000s``
  (µs); keys spread ~69 days at sf0.001 and ~694 days at sf0.01+, so
  commit timestamps genuinely straddle both DDL activation instants.
- keys with ``okey % 3 == 1`` additionally yield an UPDATE at
  ``ts0 + 2000s`` (price += 10.00); keys with ``okey % 3 == 2`` a DELETE
  — multi-event per-key lifecycles that exercise the 6-case fold on a
  typed payload.
- each event binds its schema version at ITS OWN commit_ts (an event
  pair can straddle a DDL boundary: the insert lacks a column its own
  update carries — the reference behaves identically).

All derivation is JVM column algebra (whole-stage codegen); at 100 TB the
same mount expressions run inside ``readStream`` with the registry
broadcast (see plans/schema_registry.py for the as-of strategies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ticdc_spark.plans.schema_registry import SCHEMA_VERSIONS
from ticdc_spark.sources.changelog import epoch_us, read_table

_BASE_TS = 1_704_067_200_000_000  # 2024-01-01 UTC (µs)
_KEY_STEP = 4_000_000_000         # 4000 s per orderkey
_UPD_DELTA = 2_000_000_000        # update/delete trails insert by 2000 s

ORDERS_TABLE_ID = 100
ORDERS_PK = ("okey",)


def _schema_version(commit_ts: F.Column) -> F.Column:
    """Map-side as-of bind (S5/J1): largest version with version_ts <= ts."""
    expr = F.lit(None).cast("int")
    for v, ts in sorted(SCHEMA_VERSIONS, key=lambda p: p[1]):
        expr = F.when(commit_ts >= F.lit(ts), F.lit(v)).otherwise(expr)
    return expr


def _payload(price: F.Column, version: F.Column) -> F.Column:
    """Typed orders payload at a given schema version: columns that do
    not exist yet at that version are NULL (the mounter cannot decode a
    column the schema doesn't have)."""
    return F.struct(
        F.col("okey").alias("okey"),
        F.col("cust").alias("cust"),
        price.alias("price"),
        F.when(version >= 2, F.col("status")).alias("status"),
        F.when(version >= 3, F.col("priority")).alias("priority"),
        F.col("odate").alias("odate"),
    )


def orders_changelog(
    spark: SparkSession, sf_dir: str, parallel: bool = False
) -> DataFrame:
    """Typed per-table changelog over the ``orders`` parquet table.

    ``parallel=True`` spreads the single-row-group scan before the
    mount derivation (see ``events_changelog``)."""
    o = read_table(spark, sf_dir, "orders")
    if parallel:
        from ticdc_spark.sources.changelog import scale_out
        o = scale_out(o)
    base = o.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("cust"),
        F.col("o_totalprice").alias("price0"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.date_format(
            F.timestamp_micros(epoch_us(o, "o_orderdate")), "yyyy-MM-dd"
        ).alias("odate"),
        (F.lit(_BASE_TS) + F.col("o_orderkey") * F.lit(_KEY_STEP)).alias("ts0"),
    )

    ins = base.select(
        "okey", "cust", "status", "priority", "odate",
        F.col("price0").alias("price"),
        F.col("ts0").alias("commit_ts"),
        F.lit("I").alias("op"),
        (F.col("okey") * 2).cast("long").alias("seq"),
    )
    tail = base.filter(F.col("okey") % 3 != 0).select(
        "okey", "cust", "status", "priority", "odate",
        F.col("price0").alias("price"),
        (F.col("ts0") + F.lit(_UPD_DELTA)).alias("commit_ts"),
        F.when(F.col("okey") % 3 == 1, F.lit("U")).otherwise(F.lit("D")).alias("op"),
        (F.col("okey") * 2 + 1).cast("long").alias("seq"),
    )
    ev = ins.unionByName(tail)

    version = _schema_version(F.col("commit_ts"))
    before = F.when(
        F.col("op").isin("U", "D"), _payload(F.col("price"), version)
    )
    after = F.when(
        F.col("op") == "I", _payload(F.col("price"), version)
    ).when(
        F.col("op") == "U", _payload(F.col("price") + F.lit(10.0), version)
    )
    return ev.select(
        F.lit("tpch").alias("schema_name"),
        F.lit("orders").alias("table_name"),
        F.lit(ORDERS_TABLE_ID).cast("long").alias("table_id"),
        "op",
        "commit_ts",
        (F.col("commit_ts") - 1).alias("start_ts"),
        "seq",
        F.when(F.col("op") == "D", 1)
        .when(F.col("op") == "U", 2)
        .otherwise(3)
        .alias("dml_order"),
        F.col("okey").cast("long").alias("pk"),
        version.alias("schema_version"),
        before.alias("before"),
        after.alias("after"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle side — identical derivation (any change above MUST be
# mirrored here). v2/v3 activation instants from SCHEMA_VERSIONS.
# ---------------------------------------------------------------------------
_V2_TS = dict(SCHEMA_VERSIONS)[2]
_V3_TS = dict(SCHEMA_VERSIONS)[3]

ORDERS_CL_SQL = f"""
orders_base AS (
    SELECT o_orderkey AS okey, o_custkey AS cust, o_totalprice AS price0,
           o_orderstatus AS status, o_orderpriority AS priority,
           strftime(o_orderdate, '%Y-%m-%d') AS odate,
           {_BASE_TS} + o_orderkey * {_KEY_STEP} AS ts0
    FROM orders
),
orders_ev AS (
    SELECT okey, cust, status, priority, odate, price0 AS price,
           ts0 AS commit_ts, 'I' AS op, CAST(okey * 2 AS BIGINT) AS seq
    FROM orders_base
    UNION ALL
    SELECT okey, cust, status, priority, odate, price0,
           ts0 + {_UPD_DELTA},
           CASE WHEN okey % 3 = 1 THEN 'U' ELSE 'D' END,
           CAST(okey * 2 + 1 AS BIGINT)
    FROM orders_base WHERE okey % 3 <> 0
),
orders_cl AS (
    SELECT 'tpch' AS schema_name, 'orders' AS table_name,
           CAST({ORDERS_TABLE_ID} AS BIGINT) AS table_id,
           op, commit_ts, commit_ts - 1 AS start_ts, seq,
           CASE op WHEN 'D' THEN 1 WHEN 'U' THEN 2 ELSE 3 END AS dml_order,
           CAST(okey AS BIGINT) AS pk,
           CASE WHEN commit_ts >= {_V3_TS} THEN 3
                WHEN commit_ts >= {_V2_TS} THEN 2 ELSE 1 END AS schema_version,
           CASE WHEN op IN ('U', 'D') THEN okey END AS before_okey,
           CASE WHEN op IN ('U', 'D') THEN cust END AS before_cust,
           CASE WHEN op IN ('U', 'D') THEN price END AS before_price,
           CASE WHEN op IN ('U', 'D') AND commit_ts >= {_V2_TS}
                THEN status END AS before_status,
           CASE WHEN op IN ('U', 'D') AND commit_ts >= {_V3_TS}
                THEN priority END AS before_priority,
           CASE WHEN op IN ('U', 'D') THEN odate END AS before_odate,
           CASE WHEN op IN ('I', 'U') THEN okey END AS after_okey,
           CASE WHEN op IN ('I', 'U') THEN cust END AS after_cust,
           CASE WHEN op = 'I' THEN price
                WHEN op = 'U' THEN price + 10.0 END AS after_price,
           CASE WHEN op IN ('I', 'U') AND commit_ts >= {_V2_TS}
                THEN status END AS after_status,
           CASE WHEN op IN ('I', 'U') AND commit_ts >= {_V3_TS}
                THEN priority END AS after_priority,
           CASE WHEN op IN ('I', 'U') THEN odate END AS after_odate
    FROM orders_ev
)
"""

ORDERS_PAYLOAD_FIELDS = ["okey", "cust", "price", "status", "priority", "odate"]


def flat_orders_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    cl = orders_changelog(spark, sf_dir)
    cols = [
        "schema_name", "table_name", "table_id", "op", "commit_ts",
        "start_ts", "seq", "dml_order", "pk", "schema_version",
    ]
    for img in ("before", "after"):
        cols += [
            F.col(f"{img}.{f}").alias(f"{img}_{f}") for f in ORDERS_PAYLOAD_FIELDS
        ]
    return cl.select(*cols)


# ---------------------------------------------------------------------------
# Composite handle key: lineitem keyed by (okey, line) — exercises the
# multi-column forms of update-split (P2), the columns partitioner (R5),
# and multi-name pkNames in encoders.
# ---------------------------------------------------------------------------
LINEITEM_TABLE_ID = 7
LINEITEM_PK = ("okey", "line")
LINEITEM_PAYLOAD_FIELDS = ["okey", "line", "qty", "price"]


def lineitem_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed changelog over lineitem with a composite handle key.

    Derivation (mirrored in ``LINEITEM_CL_SQL``): op from l_returnflag
    (N→I, A→U, R→D); updates on line 1 shift the line number by +100 — a
    handle-key-CHANGING update on one component of the composite key
    (split required, `pkg/common/kv_entry.go:107-131`); before images
    carry qty+1 / price+1.00 as the deterministic pre-image.
    """
    li = read_table(spark, sf_dir, "lineitem")
    op = (
        F.when(F.col("l_returnflag") == "N", F.lit("I"))
        .when(F.col("l_returnflag") == "A", F.lit("U"))
        .otherwise(F.lit("D"))
    )
    line = F.col("l_linenumber").cast("long")
    line_shift = F.when(
        (op == "U") & (F.col("l_linenumber") == 1), F.lit(100)
    ).otherwise(F.lit(0)).cast("long")
    commit_ts = epoch_us(li, "l_shipdate")
    before = F.when(
        op.isin("U", "D"),
        F.struct(
            F.col("l_orderkey").cast("long").alias("okey"),
            line.alias("line"),
            (F.col("l_quantity") + F.lit(1.0)).alias("qty"),
            (F.col("l_extendedprice") + F.lit(1.0)).alias("price"),
        ),
    )
    after = F.when(
        op.isin("I", "U"),
        F.struct(
            F.col("l_orderkey").cast("long").alias("okey"),
            (line + line_shift).alias("line"),
            F.col("l_quantity").alias("qty"),
            F.col("l_extendedprice").alias("price"),
        ),
    )
    return li.select(
        F.lit("tpch").alias("schema_name"),
        F.lit("lineitem").alias("table_name"),
        F.lit(LINEITEM_TABLE_ID).cast("long").alias("table_id"),
        op.alias("op"),
        commit_ts.alias("commit_ts"),
        (commit_ts - 1).alias("start_ts"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long").alias("seq"),
        F.when(op == "D", 1).when(op == "U", 2).otherwise(3).alias("dml_order"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long").alias("pk"),
        before.alias("before"),
        after.alias("after"),
    )


LINEITEM_CL_SQL = f"""
li_cl AS (
    SELECT 'tpch' AS schema_name, 'lineitem' AS table_name,
           CAST({LINEITEM_TABLE_ID} AS BIGINT) AS table_id,
           CASE l_returnflag WHEN 'N' THEN 'I' WHEN 'A' THEN 'U'
                ELSE 'D' END AS op,
           epoch_us(l_shipdate) AS commit_ts,
           epoch_us(l_shipdate) - 1 AS start_ts,
           CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS seq,
           CASE l_returnflag WHEN 'R' THEN 1 WHEN 'A' THEN 2 ELSE 3 END AS dml_order,
           CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS pk,
           CASE WHEN l_returnflag IN ('A', 'R')
                THEN CAST(l_orderkey AS BIGINT) END AS before_okey,
           CASE WHEN l_returnflag IN ('A', 'R')
                THEN CAST(l_linenumber AS BIGINT) END AS before_line,
           CASE WHEN l_returnflag IN ('A', 'R')
                THEN l_quantity + 1.0 END AS before_qty,
           CASE WHEN l_returnflag IN ('A', 'R')
                THEN l_extendedprice + 1.0 END AS before_price,
           CASE WHEN l_returnflag IN ('N', 'A')
                THEN CAST(l_orderkey AS BIGINT) END AS after_okey,
           CASE WHEN l_returnflag IN ('N', 'A')
                THEN CAST(l_linenumber AS BIGINT)
                     + CASE WHEN l_returnflag = 'A' AND l_linenumber = 1
                            THEN 100 ELSE 0 END END AS after_line,
           CASE WHEN l_returnflag IN ('N', 'A') THEN l_quantity END AS after_qty,
           CASE WHEN l_returnflag IN ('N', 'A')
                THEN l_extendedprice END AS after_price
    FROM lineitem
)
"""


# ---------------------------------------------------------------------------
# MySQL "exotic" column types through the mounter (SURVEY §2.9): ENUM
# ordinal → member name, SET bitmask → comma-joined names, BIT(n) →
# uint64, VECTOR → float array with canonical ``[v1,v2,...]`` text
# (`csv_message.go:276-323` per-type switch; schema.py type map).
# Insert-only changelog derived from ``part``; every 13th key carries
# MySQL's invalid-empty enum (ordinal 0), every 11th a NULL SET/VECTOR
# so the \N wire rendering is exercised.
# ---------------------------------------------------------------------------
EXOTIC_TABLE_ID = 300
EXOTIC_PK = ("pid",)
EXOTIC_ENUM = ("red", "green", "blue")
EXOTIC_SET = ("alpha", "beta", "gamma")


def exotic_changelog(
    spark: SparkSession, sf_dir: str, mounted: bool = True
) -> DataFrame:
    """``mounted=True`` decodes to wire-name forms (the csv view);
    ``mounted=False`` keeps the RAW storage forms — enum ordinal, set
    bitmask — which is what the canal-json wire carries
    (`canal/helper.go:93-126` formatColumnValue)."""
    from ticdc_spark.functions.render import mount_enum, mount_set

    p = read_table(spark, sf_dir, "part")
    base = p.select(
        F.col("p_partkey").alias("pid"),
        F.when(F.col("p_partkey") % 13 == 0, F.lit(0))
        .otherwise(1 + F.col("p_partkey") % 3)
        .cast("int")
        .alias("ord"),
        F.when(F.col("p_partkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("p_partkey") % 8)
        .cast("long")
        .alias("mask"),
        (F.col("p_partkey") % 256).cast("long").alias("flags"),
        F.when(F.col("p_partkey") % 11 == 0, F.lit(None))
        .otherwise(
            F.array(
                (F.col("p_partkey") % 7).cast("float"),
                (F.col("p_size") % 5).cast("float"),
            )
        )
        .alias("vec"),
        # DECIMAL / TIME / JSON scalar forms (`canal/helper.go:127-134`:
        # decimal + duration + json render via their String() text)
        F.col("p_retailprice").cast("decimal(12,2)").alias("dec"),
        F.format_string(
            "%02d:%02d:%02d",
            F.expr("CAST(p_partkey % 86400 DIV 3600 AS INT)"),
            F.expr("CAST(p_partkey % 3600 DIV 60 AS INT)"),
            F.expr("CAST(p_partkey % 60 AS INT)"),
        ).alias("tm"),
        F.concat(
            F.lit('{"k":'), (F.col("p_partkey") % 10).cast("string"), F.lit("}")
        ).alias("js"),
        (F.lit(_BASE_TS) + F.col("p_partkey") * 1000).alias("commit_ts"),
    )
    scalar_tail = (
        F.col("dec").alias("dec"),
        F.col("tm").alias("tm"),
        F.col("js").alias("js"),
    )
    if mounted:
        after = F.struct(
            F.col("pid").cast("long").alias("pid"),
            mount_enum(F.col("ord"), EXOTIC_ENUM).alias("color"),
            mount_set(F.col("mask"), EXOTIC_SET).alias("tags"),
            F.col("flags").alias("flags"),
            F.col("vec").alias("vec"),
            *scalar_tail,
        )
    else:
        after = F.struct(
            F.col("pid").cast("long").alias("pid"),
            F.col("ord").cast("long").alias("color"),
            F.col("mask").alias("tags"),
            F.col("flags").alias("flags"),
            F.col("vec").alias("vec"),
            *scalar_tail,
        )
    return base.select(
        F.lit("tpch").alias("schema_name"),
        F.lit("exotic").alias("table_name"),
        F.lit(EXOTIC_TABLE_ID).cast("long").alias("table_id"),
        F.lit("I").alias("op"),
        "commit_ts",
        (F.col("commit_ts") - 1).alias("start_ts"),
        F.col("pid").cast("long").alias("seq"),
        F.lit(3).alias("dml_order"),
        F.col("pid").cast("long").alias("pk"),
        F.when(F.lit(False), after).alias("before"),
        after.alias("after"),
    )


# DuckDB mirror of the derivation above (any change MUST be mirrored).
EXOTIC_CL_SQL = f"""
exotic_raw AS (
    SELECT p_partkey AS pid,
           CASE WHEN p_partkey % 13 = 0 THEN 0
                ELSE 1 + p_partkey % 3 END AS ord,
           CASE WHEN p_partkey % 11 = 0 THEN NULL
                ELSE p_partkey % 8 END AS mask,
           p_partkey % 256 AS flags,
           CASE WHEN p_partkey % 11 = 0 THEN NULL
                ELSE '[' || printf('%.2f', (p_partkey % 7)::DOUBLE) || ','
                  || printf('%.2f', (p_size % 5)::DOUBLE) || ']' END AS vec_txt,
           (p_retailprice::DECIMAL(12,2))::VARCHAR AS dec_txt,
           printf('%02d:%02d:%02d', (p_partkey % 86400) // 3600,
                  (p_partkey % 3600) // 60, p_partkey % 60) AS tm_txt,
           '{{"k":' || (p_partkey % 10)::VARCHAR || '}}' AS js_txt,
           {_BASE_TS} + p_partkey * 1000 AS commit_ts
    FROM part
),
exotic_cl AS (
    SELECT pid, commit_ts, flags, vec_txt, dec_txt, tm_txt, js_txt,
           CASE WHEN ord = 0 THEN ''
                ELSE list_extract(['red','green','blue'], ord) END AS color,
           CASE WHEN mask IS NULL THEN NULL ELSE concat_ws(',',
                CASE WHEN mask & 1 <> 0 THEN 'alpha' END,
                CASE WHEN mask & 2 <> 0 THEN 'beta' END,
                CASE WHEN mask & 4 <> 0 THEN 'gamma' END) END AS tags
    FROM exotic_raw
)
"""
