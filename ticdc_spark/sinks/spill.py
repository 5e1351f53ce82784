"""Large-txn spill record file (`pkg/spill/record_file.go`).

Oversized transactions spill their encoded rows to disk instead of
accumulating in memory (`pkg/eventservice/large_txn_spill.go`); the
file is a sequence of ``[length u64 LE][payload]`` records addressed by
``Handle(offset, length)`` where offset points *past* the length
prefix.  In the Spark engine this backs the driver-side accumulation
path of the streaming large-txn operator — executor-side state spilling
is Spark's own state store; this file format exists for parity with the
reference's on-disk artifacts (a reference-written spill file reads
back byte-for-byte).
"""

from __future__ import annotations

import os
import struct
import tempfile
from dataclasses import dataclass

_RECORD_LEN_SIZE = 8


@dataclass(frozen=True)
class Handle:
    offset: int
    length: int

    def valid(self) -> bool:
        return self.length > 0


class RecordFile:
    def __init__(self, dir_path: str, pattern: str = "spill-"):
        if not dir_path:
            raise ValueError("empty spill directory")
        if not pattern:
            raise ValueError("empty spill file pattern")
        os.makedirs(dir_path, mode=0o700, exist_ok=True)
        fd, self._path = tempfile.mkstemp(prefix=pattern, dir=dir_path)
        self._file = os.fdopen(fd, "r+b")
        self._closed = False
        self._cleaned = False

    @property
    def path(self) -> str:
        return self._path

    def append(self, data: bytes) -> Handle:
        return self.append_chunks(data)

    def append_chunks(self, *chunks: bytes) -> Handle:
        if self._cleaned:
            raise ValueError("spill file has been cleaned up")
        if self._closed:
            raise ValueError("spill file is closed")
        record_len = sum(len(c) for c in chunks)
        if record_len == 0:
            raise ValueError("empty spill record")
        self._file.seek(0, os.SEEK_END)
        offset = self._file.tell()
        self._file.write(struct.pack("<Q", record_len))
        for c in chunks:
            self._file.write(c)
        return Handle(offset=offset + _RECORD_LEN_SIZE, length=record_len)

    def read(self, handle: Handle) -> bytes:
        if self._cleaned:
            raise ValueError("spill file has been cleaned up")
        if not handle.valid():
            raise ValueError("invalid spill handle")
        self._file.seek(handle.offset - _RECORD_LEN_SIZE)
        (stored_len,) = struct.unpack("<Q", self._file.read(_RECORD_LEN_SIZE))
        if stored_len != handle.length:
            raise ValueError(
                f"corrupt spill record: stored {stored_len} != "
                f"handle {handle.length}")
        data = self._file.read(handle.length)
        if len(data) != handle.length:
            raise ValueError("short spill read")
        return data

    def close(self) -> None:
        if not self._closed:
            self._file.close()
            self._closed = True

    def cleanup(self) -> None:
        self.close()
        if not self._cleaned:
            os.unlink(self._path)
            self._cleaned = True


def scan_records(path: str) -> list[bytes]:
    """Sequentially decode every record in a spill file — the replay
    path (also reads reference-written files)."""
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(_RECORD_LEN_SIZE)
            if len(head) < _RECORD_LEN_SIZE:
                break
            (n,) = struct.unpack("<Q", head)
            data = f.read(n)
            if len(data) != n:
                raise ValueError("truncated spill record")
            out.append(data)
    return out
