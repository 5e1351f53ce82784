"""Storage-sink data-file numbering + index-file recovery —
`pkg/cloudstorage/generator.go:125-473` and the writer's index upload
(`downstreamadapter/sink/cloudstorage/writer.go:265`).

Each (table-version, date) directory carries ``meta/CDC.index`` (or
``meta/CDC_<dispatcherID>.index`` when tables split across nodes) whose
content is the basename of the LAST flushed data file.  The generator
keeps an in-memory per-directory counter that:

- seeds from the index file on first touch (sink restart / dispatcher
  ownership transfer),
- resets to 0 on date rollover,
- and on collision with an existing data file reloads the index file
  ONCE, then falls back to consecutive existence probes — the
  stale-index recovery path (`generator.go:377-410`).

Consumers resume by reading the same index file (the "current tail"
lookup the storage consumer performs).
"""
from __future__ import annotations

import os
import re


class InvalidFileName(ValueError):
    """ErrStorageSinkInvalidFileName."""


class _LocalFS:
    """storage.ExternalStorage stand-in over the local filesystem;
    inject a fake for unit tests of remote semantics."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def write(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)


def data_file_name(index: int, extension: str, file_index_width: int,
                   dispatcher_id: str = "",
                   enable_table_across_nodes: bool = False) -> str:
    """CDC<index><ext> / CDC_<dispatcherID>_<index><ext>
    (`generator.go:127-133`)."""
    num = f"{index:0{file_index_width}d}"
    if enable_table_across_nodes:
        return f"CDC_{dispatcher_id}_{num}{extension}"
    return f"CDC{num}{extension}"


def index_file_name(dispatcher_id: str = "",
                    enable_table_across_nodes: bool = False) -> str:
    if enable_table_across_nodes:
        return f"meta/CDC_{dispatcher_id}.index"
    return "meta/CDC.index"


def parse_file_index(file_name: str, extension: str) -> int:
    """Numeric index inside a data file name; refuses names that are
    not CDC-prefixed or wrongly suffixed (`ParseFileIndexFromFileName`,
    `generator.go:477-500`)."""
    if not file_name.startswith("CDC") or not file_name.endswith(extension):
        raise InvalidFileName(f"invalid data file name: {file_name!r}")
    body = file_name[len("CDC"):len(file_name) - len(extension)]
    m = re.fullmatch(r"(?:_[^_]+_)?(\d+)", body)
    if not m:
        raise InvalidFileName(f"invalid data file name: {file_name!r}")
    return int(m.group(1))


class FilePathGenerator:
    def __init__(self, extension: str, file_index_width: int = 20,
                 enable_table_across_nodes: bool = False,
                 fs=None) -> None:
        self.extension = extension
        # DefaultFileIndexWidth=20, clamp [6, 20] (`pkg/config/sink.go`)
        self.width = min(max(int(file_index_width), 6), 20)
        self.across = enable_table_across_nodes
        self.fs = fs or _LocalFS()
        # dir_key -> {"index": int, "prev_date": str, "curr_date": str}
        self._state: dict[str, dict] = {}

    # -- paths ----------------------------------------------------------
    def index_file_path(self, date_dir: str,
                        dispatcher_id: str = "") -> str:
        return os.path.join(
            date_dir, index_file_name(dispatcher_id, self.across))

    def _read_index(self, date_dir: str, dispatcher_id: str) -> int:
        path = self.index_file_path(date_dir, dispatcher_id)
        if not self.fs.exists(path):
            return 0
        file_name = self.fs.read(path).decode().rstrip("\n")
        return parse_file_index(file_name, self.extension)

    # -- the protocol ---------------------------------------------------
    def generate_data_file_path(self, date_dir: str, date: str,
                                dispatcher_id: str = "") -> str:
        st = self._state.get(date_dir)
        loaded_index_file = False
        if st is None:
            st = {"index": self._read_index(date_dir, dispatcher_id),
                  "prev_date": date, "curr_date": date}
            self._state[date_dir] = st
            loaded_index_file = True
        else:
            st["curr_date"] = date
        if st["prev_date"] != st["curr_date"]:
            st["prev_date"] = st["curr_date"]
            st["index"] = 0
        tried_resync = loaded_index_file
        while True:
            st["index"] += 1
            name = data_file_name(st["index"], self.extension, self.width,
                                  dispatcher_id, self.across)
            data_file = os.path.join(date_dir, name)
            if not self.fs.exists(data_file):
                return data_file
            if not tried_resync:
                tried_resync = True
                idx = self._read_index(date_dir, dispatcher_id)
                if idx >= st["index"]:
                    st["index"] = idx
                    continue
            # stale index: keep probing consecutively

    def record_flush(self, date_dir: str, data_file_path: str,
                     dispatcher_id: str = "") -> None:
        """Writer-side index upload after a successful data-file flush
        (`writer.go:265`: content = basename + newline)."""
        self.fs.write(
            self.index_file_path(date_dir, dispatcher_id),
            (os.path.basename(data_file_path) + "\n").encode())

    def consumer_tail(self, date_dir: str, dispatcher_id: str = "") -> int:
        """Consumer resume: the highest flushed index per the index
        file (0 = nothing flushed)."""
        return self._read_index(date_dir, dispatcher_id)
