"""Live MySQL sink apply: generated DML over the real wire protocol.

Composes the K1 writer path end to end against a live endpoint:
changelog → update-split → conflict slots → safe-mode SQL generation
(`sinks/mysql.py`) → per-slot ordered apply where every Spark partition
dials the MySQL-protocol server (`sinks/mysql_server.py`) like the
reference's per-worker connections (`pkg/sink/mysql` MySQLSink workers),
runs the session-init statements, and flushes multi-statement batches —
then the final table state is read back over the same wire.

The apply is a construction-time job (sink flush, trainer precedent);
the returned DataFrame is the readback state, comparable against the
materialize_state oracle with the canonical %.2f double rendering the
statements put on the wire. The pieces (create_tables / apply_over_wire
/ read_state_df) are reusable — the live sync-diff test drives an
upstream/downstream pair through them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# keep servers alive until the driver finishes evaluating the readback
_LIVE_SERVERS: list = []

_BATCH_STMTS = 256


def start_server(schema: str = "test", user: str = "root", password: str = "cdc-secret"):
    from ticdc_spark.sinks.mysql_server import MiniMySQLServer

    srv = MiniMySQLServer(user=user, password=password, schemas=(schema,)).start()
    _LIVE_SERVERS.append(srv)
    return srv


def create_tables(host: str, port: int, user: str, password: str,
                  tables: list[str], schema: str = "test") -> None:
    from ticdc_spark.sinks.mysql_client import MySQLConn

    with MySQLConn(host, port, user, password) as c:
        for t in tables:
            c.query(
                f"CREATE TABLE `{schema}`.`{t}` "
                "(`id` BIGINT PRIMARY KEY, `val` DOUBLE, `k` BIGINT)"
            )


def apply_over_wire(
    cl_split: DataFrame, host: str, port: int, user: str, password: str,
    n_slots: int = 16,
) -> None:
    """Per-slot concurrent distributed apply of the safe-mode statement
    stream; each Spark partition holds one connection, session-init
    first, then 256-statement multi-statement batches."""
    from ticdc_spark.sinks.jdbc import statements_for_batch
    from ticdc_spark.sinks.mysql import session_init_statements

    stmts = statements_for_batch(cl_split, safe_mode=True, n_slots=n_slots)
    init = session_init_statements()

    def _apply(rows_iter):
        from ticdc_spark.sinks.mysql_client import MySQLConn

        conn = None
        buf: list[str] = []
        try:
            for row in rows_iter:
                if conn is None:
                    conn = MySQLConn(host, port, user, password)
                    for s in init:
                        conn.query(s)
                buf.append(row["stmt"])
                if len(buf) >= _BATCH_STMTS:
                    conn.execute_batch(buf)
                    buf = []
            if conn is not None and buf:
                conn.execute_batch(buf)
        finally:
            if conn is not None:
                conn.close()

    stmts.foreachPartition(_apply)


def read_state_df(
    spark: SparkSession, host: str, port: int, user: str, password: str,
    tables: list[str], schema: str = "test",
) -> DataFrame:
    """Final state (table_name, id, val, k) read back via SELECT over the
    wire — small (one row per live key), so a driver-side collect is the
    honest shape; a 100 TB deployment diffs downstream with sync-diff."""
    from ticdc_spark.sinks.mysql_client import MySQLConn

    rows = []
    with MySQLConn(host, port, user, password) as c:
        for t in tables:
            rs = c.query(f"SELECT `id`, `val`, `k` FROM `{schema}`.`{t}`")
            rows.extend((t, r[0], r[1], r[2]) for r in rs.rows)
    return spark.createDataFrame(
        rows, "table_name string, id long, val double, k long"
    )


def mysql_live_apply(
    cl_split: DataFrame,
    tables: list[str],
    schema: str = "test",
    n_slots: int = 16,
    user: str = "root",
    password: str = "cdc-secret",
) -> DataFrame:
    """Apply the (post-split) changelog over the wire; return final state
    (table_name, id, val, k) read back via SELECT on the same socket."""
    spark = cl_split.sparkSession
    srv = start_server(schema, user, password)
    create_tables(srv.host, srv.port, user, password, tables, schema)
    apply_over_wire(cl_split, srv.host, srv.port, user, password, n_slots)
    return read_state_df(spark, srv.host, srv.port, user, password, tables, schema)
