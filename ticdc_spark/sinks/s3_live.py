"""Live cloud-storage sink: the K4 file layout over the real S3 REST API.

Composes the storage sink path layout (`sinks/storage.py`) with the
in-process S3 endpoint: every Spark partition materializes its
(path, file_name) groups into CSV objects and PUTs them with SigV4-signed
requests; the consumer lists the bucket back through real ListObjectsV2
pagination and GETs each object from executor tasks — the
`downstreamadapter/sink/cloudstorage` deployment shape with the SDK
replaced by this repo's own wire client.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LIVE_SERVERS: list = []

BUCKET = "cdc"


def start_server():
    from ticdc_spark.sinks.s3_server import MiniS3Server

    srv = MiniS3Server().start()
    _LIVE_SERVERS.append(srv)
    return srv


def _client(srv_endpoint: str, access_key: str, secret_key: str):
    from ticdc_spark.sinks.s3_client import S3Client

    return S3Client(srv_endpoint, access_key, secret_key)


def put_files(files: DataFrame, endpoint: str, access_key: str, secret_key: str) -> None:
    """files: rows carrying (path, file_name, value [, ordering cols]).
    One object per (path, file_name), rows joined in replay-key order."""
    cols = files.columns
    order = [c for c in ("commit_ts", "dml_order", "seq") if c in cols]
    shaped = (
        files.repartition("path", "file_name")
        .sortWithinPartitions("path", "file_name", *order)
        .select("path", "file_name", "value")
    )

    def _put(rows_iter):
        client = None
        cur: tuple[str, str] | None = None
        buf: list[str] = []

        def flush():
            nonlocal client
            if cur is None or not buf:
                return
            if client is None:
                client = _client(endpoint, access_key, secret_key)
            client.put_object(BUCKET, f"{cur[0]}/{cur[1]}",
                              ("\n".join(buf) + "\n").encode("utf-8"))

        try:
            for row in rows_iter:
                key = (row["path"], row["file_name"])
                if key != cur:
                    flush()
                    cur = key
                    buf = []
                buf.append(row["value"])
            flush()
        finally:
            if client is not None:
                client.close()

    shaped.foreachPartition(_put)


def get_files_df(
    spark: SparkSession, endpoint: str, access_key: str, secret_key: str,
    list_page_size: int = 64,
) -> DataFrame:
    """List the bucket (real continuation-token pages) and GET every
    object from executor tasks -> (path, value) rows, one per CSV line."""
    with _client(endpoint, access_key, secret_key) as c:
        keys = [k for k, _ in c.list_objects(BUCKET, max_keys=list_page_size)]
    kdf = spark.createDataFrame([(k,) for k in keys], "key string").repartition(
        max(1, min(len(keys), 64)), "key"
    )

    def _get(batches):
        import pandas as pd

        client = None
        try:
            for pdf in batches:
                for key in pdf["key"]:
                    if client is None:
                        client = _client(endpoint, access_key, secret_key)
                    body = client.get_object(BUCKET, key).decode("utf-8")
                    path = key.rsplit("/", 1)[0]
                    lines = [ln for ln in body.split("\n") if ln]
                    if lines:
                        yield pd.DataFrame({"path": path, "value": lines})
        finally:
            if client is not None:
                client.close()

    return kdf.mapInPandas(_get, "path string, value string")


def storage_live_s3_roundtrip(cl_split: DataFrame) -> DataFrame:
    """CSV-encode -> path layout -> SigV4 PUT -> ListObjectsV2 + GET ->
    storage-consumer decode -> replayed state."""
    from ticdc_spark.codec.csv_codec import encode_csv
    from ticdc_spark.sinks.consumer import decode_csv_storage, replay_to_state
    from ticdc_spark.sinks.storage import storage_paths

    spark = cl_split.sparkSession
    srv = start_server()
    files = storage_paths(encode_csv(cl_split))
    put_files(files, srv.endpoint, srv.access_key, srv.secret_key)
    fetched = get_files_df(spark, srv.endpoint, srv.access_key, srv.secret_key)
    return replay_to_state(decode_csv_storage(fetched), order_col="commit_ts")
