"""Kafka wire-protocol client: connect, handshake, produce, fetch.

The producer path mirrors what the reference's sarama/franz-go clients do
on behalf of `pkg/sink/kafka`: ApiVersions handshake, Metadata for the
topic, then Produce v3 requests carrying v2 record batches (acks=-1).
The consumer path is the storage-consumer analogue: Fetch v4 loops until
the high watermark.

Runs inside executor Python workers (each partition dials its own TCP
connection) — see sink_queries.kafka_live_roundtrip for the distributed
composition.
"""

from __future__ import annotations

import socket
import struct

from ticdc_spark.codec import kafka_wire as kw
from ticdc_spark.sinks.kafka_broker import _recv_exact


class KafkaConn:
    def __init__(self, host: str, port: int, client_id: str = "ticdc-spark", timeout: float = 30.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.client_id = client_id
        self._corr = 0
        self.api_versions = self._handshake()

    @classmethod
    def from_bootstrap(cls, bootstrap: str, **kw_) -> "KafkaConn":
        host, port = bootstrap.rsplit(":", 1)
        return cls(host, int(port), **kw_)

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- request/response round trip

    def _call(self, api_key: int, api_version: int, body: bytes) -> kw.Reader:
        self._corr += 1
        corr = self._corr
        self.sock.sendall(kw.frame_request(api_key, api_version, corr, self.client_id, body))
        hdr = _recv_exact(self.sock, 4)
        if hdr is None:
            raise IOError("broker closed connection")
        (size,) = struct.unpack(">i", hdr)
        payload = _recv_exact(self.sock, size)
        if payload is None:
            raise IOError("broker closed connection mid-response")
        r = kw.Reader(payload)
        got_corr = r.i32()
        if got_corr != corr:
            raise IOError(f"correlation id mismatch: sent {corr}, got {got_corr}")
        return r

    def _handshake(self) -> dict[int, tuple[int, int]]:
        versions = kw.dec_api_versions_response(self._call(kw.API_API_VERSIONS, 0, b""))
        for key, ver in ((kw.API_PRODUCE, 3), (kw.API_FETCH, 4), (kw.API_METADATA, 1)):
            lo, hi = versions.get(key, (-1, -2))
            if not (lo <= ver <= hi):
                raise IOError(f"broker doesn't support api {key} v{ver} (offers {lo}..{hi})")
        return versions

    # -- api calls

    def metadata(self, topics: list[str] | None = None) -> dict:
        return kw.dec_metadata_response(self._call(kw.API_METADATA, 1, kw.enc_metadata_request(topics)))

    def produce(
        self,
        topic: str,
        partition: int,
        records: list[kw.Record],
        compression: str = "none",
        base_timestamp: int = 0,
    ) -> int:
        """Produce one batch with acks=-1; returns the assigned base offset."""
        record_set = kw.encode_record_batch(
            records, base_timestamp=base_timestamp, compression=compression
        )
        resp = kw.dec_produce_response(
            self._call(kw.API_PRODUCE, 3, kw.enc_produce_request({topic: {partition: record_set}}))
        )
        err, base = resp[topic][partition]
        if err:
            raise IOError(f"produce to {topic}/{partition} failed: error_code={err}")
        return base

    def fetch_all(self, topic: str, partition: int, from_offset: int = 0) -> list[tuple[int, kw.Record]]:
        """Fetch every record in [from_offset, high watermark) -> [(offset, record)]."""
        out: list[tuple[int, kw.Record]] = []
        offset = from_offset
        while True:
            resp = kw.dec_fetch_response(
                self._call(kw.API_FETCH, 4, kw.enc_fetch_request(topic, partition, offset))
            )
            (_, _, err, hw, record_set) = resp[0]
            if err:
                raise IOError(f"fetch {topic}/{partition}@{offset}: error_code={err}")
            if not record_set:
                return out
            for base, records in kw.decode_record_batches(record_set):
                for rec in records:
                    off = base + rec.offset_delta
                    if off >= offset:
                        out.append((off, rec))
            if out:
                offset = out[-1][0] + 1
            if offset >= hw:
                return out
