"""Cloud-storage sink disk spool — encoded-but-unflushed batches parked
on local disk under a byte budget (SURVEY §2.11 K4 depth).

Reference: `downstreamadapter/sink/cloudstorage/spool/` —
``spool.go`` (segment files, Enqueue/Load/Release/Discard lifecycle),
``budget.go`` (memory/disk byte thresholds derived from the disk
quota), ``quota.go`` (PostEnqueue pause/resume watermarks + disk-quota
waiters), ``codec.go`` (LE-u32 framed message blobs).  Config keys
``spool-base-dir`` / ``spool-disk-quota`` (`pkg/config/sink.go:736-737`).

Semantics kept:
- an entry stays IN MEMORY while memory usage fits ``memory_ratio`` ×
  quota; past that it spills to an append-only segment file
  (``segment-<id>.log``, rolled at ``segment_capacity``);
- a single entry larger than the whole disk quota is accepted
  OVERSIZED in memory and should be flushed immediately
  (`spool.go:417-424`);
- a spill that would exceed the disk quota answers WAIT_DISK_QUOTA —
  the caller flushes what it has and blocks in
  :meth:`Spool.wait_for_disk_quota` until releases free room
  (`spool.go:425-428,437-470`);
- PostEnqueue callbacks pause above the high watermark (0.8 × quota)
  and resume below the low watermark (0.6 × quota) (`quota.go`);
- ``release`` drops a segment file once its last entry is released and
  it is no longer the append target; ``close`` removes the work dir
  (`spool.go:609-680`).

Deployment shape: ONE spool per writer shard — here, one per Spark
partition of the storage-sink upload stage, rooted at
``<spool-base-dir>/<changefeed>/<partition>`` on the executor's local
disk, exactly the reference's per-changefeed work dir resolution
(`spool.go:375-390`).
"""

from __future__ import annotations

import os
import shutil
import struct
import threading

# `spool.go:36-61` defaults
DEFAULT_SEGMENT_CAPACITY = 64 * 1024 * 1024
DEFAULT_DISK_QUOTA = 10 * 1024 * 1024 * 1024
DEFAULT_MEMORY_RATIO = 0.2
DEFAULT_HIGH_WATERMARK_RATIO = 0.8
DEFAULT_LOW_WATERMARK_RATIO = 0.6

# EnqueueAction (`spool.go:536-547`)
ACCEPTED = 0
ACCEPTED_OVERSIZED = 1
WAIT_DISK_QUOTA = 2

_COUNT_BYTES = 4    # serializedMessageCountBytes
_HEADER_BYTES = 12  # serializedMessageHeaderBytes


def serialize_messages(msgs: list[tuple[bytes | None, bytes, int]]) -> bytes:
    """codec.go serializeMessages: LE u32 count, then per message LE
    u32 key-len / value-len / rows-count + key + value bytes."""
    out = bytearray(struct.pack("<I", len(msgs)))
    for key, value, rows in msgs:
        key = key or b""
        out += struct.pack("<III", len(key), len(value), rows)
        out += key
        out += value
    return bytes(out)


def deserialize_messages(blob: bytes) -> list[tuple[bytes | None, bytes, int]]:
    """codec.go serializedMessageReader, including the corrupted-count
    guard (count larger than the payload could hold -> error before a
    huge allocation)."""
    if len(blob) < _COUNT_BYTES:
        raise ValueError("truncated spool blob")
    (count,) = struct.unpack_from("<I", blob, 0)
    max_count = (len(blob) - _COUNT_BYTES) // _HEADER_BYTES
    if count > max_count:
        raise ValueError(
            f"message count {count} exceeds maximum {max_count} for "
            f"{len(blob)}-byte payload")
    pos = _COUNT_BYTES
    out = []
    for _ in range(count):
        if len(blob) - pos < _HEADER_BYTES:
            raise ValueError("truncated spool blob")
        klen, vlen, rows = struct.unpack_from("<III", blob, pos)
        pos += _HEADER_BYTES
        if len(blob) - pos < klen + vlen:
            raise ValueError("truncated spool blob")
        key = blob[pos:pos + klen]
        pos += klen
        value = blob[pos:pos + vlen]
        pos += vlen
        out.append((key if klen else None, value, rows))
    return out


class _Budget:
    """budget.go verbatim math."""

    def __init__(self, disk_quota: int, memory_ratio: float,
                 high_ratio: float, low_ratio: float):
        self.disk_quota = disk_quota
        self.memory_quota = int(disk_quota * memory_ratio)
        self.high_watermark = int(disk_quota * high_ratio)
        self.low_watermark = int(disk_quota * low_ratio)
        self.memory_bytes = 0
        self.disk_bytes = 0

    def should_spill(self, entry_bytes: int) -> bool:
        return self.memory_bytes + entry_bytes > self.memory_quota

    def entry_exceeds_disk_quota(self, entry_bytes: int) -> bool:
        return entry_bytes > self.disk_quota

    def spill_would_exceed_disk_quota(self, entry_bytes: int) -> bool:
        return self.disk_bytes + entry_bytes > self.disk_quota

    def acquire(self, entry_bytes: int, spilled: bool) -> bool:
        if spilled:
            self.disk_bytes += entry_bytes
        else:
            self.memory_bytes += entry_bytes
        return self.memory_bytes + self.disk_bytes > self.high_watermark

    def release(self, entry_bytes: int, spilled: bool) -> bool:
        if spilled:
            self.disk_bytes = max(0, self.disk_bytes - entry_bytes)
        else:
            self.memory_bytes = max(0, self.memory_bytes - entry_bytes)
        return (self.memory_bytes + self.disk_bytes
                <= self.low_watermark)


class Entry:
    """The handle the writer keeps per accepted batch (`spool.go:549`)."""

    __slots__ = ("memory_msgs", "location", "post_flush_callbacks",
                 "accounting_bytes", "file_bytes", "_consumed")

    def __init__(self):
        self.memory_msgs = None
        self.location = None       # (segment_id, offset, length)
        self.post_flush_callbacks = []
        self.accounting_bytes = 0
        self.file_bytes = 0
        self._consumed = False

    def is_spilled(self) -> bool:
        return self.location is not None

    def in_memory(self) -> bool:
        return self.memory_msgs is not None


class _Segment:
    __slots__ = ("id", "path", "file", "size", "ref_cnt")

    def __init__(self, sid: int, path: str):
        self.id = sid
        self.path = path
        self.file = open(path, "w+b")
        self.size = 0
        self.ref_cnt = 0


def _entry_size(msgs: list[tuple[bytes | None, bytes, int]]) -> tuple[int, int]:
    """(accounting_bytes, file_bytes): accounting counts key+value like
    calculateEntrySize; file_bytes is the payload that later lands in
    the data file (values only)."""
    acc = 0
    fb = 0
    for key, value, _rows in msgs:
        acc += len(key or b"") + len(value)
        fb += len(value)
    return acc, fb


class Spool:
    def __init__(self, changefeed: str, root_dir: str,
                 disk_quota_bytes: int = 0,
                 segment_capacity: int = 0,
                 memory_ratio: float = DEFAULT_MEMORY_RATIO,
                 high_watermark_ratio: float = DEFAULT_HIGH_WATERMARK_RATIO,
                 low_watermark_ratio: float = DEFAULT_LOW_WATERMARK_RATIO):
        # option normalization (`spool.go:93-180`): non-positive values
        # fall back to defaults; inverted watermarks reset to defaults
        if disk_quota_bytes <= 0:
            disk_quota_bytes = DEFAULT_DISK_QUOTA
        if segment_capacity <= 0:
            segment_capacity = DEFAULT_SEGMENT_CAPACITY
        if not 0 < memory_ratio < 1:
            memory_ratio = DEFAULT_MEMORY_RATIO
        if not 0 < high_watermark_ratio < 1:
            high_watermark_ratio = DEFAULT_HIGH_WATERMARK_RATIO
        if not 0 < low_watermark_ratio < 1:
            low_watermark_ratio = DEFAULT_LOW_WATERMARK_RATIO
        if low_watermark_ratio >= high_watermark_ratio:
            low_watermark_ratio = DEFAULT_LOW_WATERMARK_RATIO
            high_watermark_ratio = DEFAULT_HIGH_WATERMARK_RATIO
        self.work_dir = os.path.join(root_dir, changefeed)
        # prepareWorkDir: the dir is owned by ONE spool instance —
        # recreate from scratch on startup (`spool.go:392-404`)
        shutil.rmtree(self.work_dir, ignore_errors=True)
        os.makedirs(self.work_dir, exist_ok=True)
        self._budget = _Budget(disk_quota_bytes, memory_ratio,
                               high_watermark_ratio, low_watermark_ratio)
        self.segment_capacity = segment_capacity
        self._lock = threading.Lock()
        self._quota_cv = threading.Condition(self._lock)
        self._closed = False
        self._next_segment_id = 0
        self._active_segment: _Segment | None = None
        self._segments: dict[int, _Segment] = {}
        # quota.go PostEnqueue pause/resume
        self._post_enqueue_paused = False
        self._pending_post_enqueue: list = []
        self.rotated_count = 0

    # -- introspection for tests/probes
    @property
    def memory_bytes(self) -> int:
        return self._budget.memory_bytes

    @property
    def disk_bytes(self) -> int:
        return self._budget.disk_bytes

    @property
    def segment_count(self) -> int:
        return len(self._segments)

    # -- enqueue side

    def try_enqueue(self, msgs, post_enqueue=None):
        """TryEnqueue (`spool.go:406-435`) -> (action, entry|None)."""
        acc, fb = _entry_size(msgs)
        if acc == 0:
            return ACCEPTED, Entry()
        with self._lock:
            if self._closed:
                raise RuntimeError("spool is closed")
            should_spill = self._budget.should_spill(acc)
            if should_spill and self._budget.entry_exceeds_disk_quota(acc):
                entry, cb = self._accept_locked(msgs, post_enqueue,
                                                acc, fb, force_memory=True)
                action = ACCEPTED_OVERSIZED
            elif should_spill and self._budget.spill_would_exceed_disk_quota(acc):
                return WAIT_DISK_QUOTA, None
            else:
                entry, cb = self._accept_locked(msgs, post_enqueue, acc, fb)
                action = ACCEPTED
        if cb is not None:
            cb()
        return action, entry

    def wait_for_disk_quota(self, msgs, timeout: float | None = None) -> bool:
        """Block until a spilled entry of this size would fit
        (`spool.go:437-470`).  Returns False on timeout."""
        acc, _ = _entry_size(msgs)
        if acc == 0:
            return True
        with self._quota_cv:
            return self._quota_cv.wait_for(
                lambda: (self._closed
                         or not self._budget.spill_would_exceed_disk_quota(acc)),
                timeout=timeout) and not self._closed

    def enqueue(self, msgs, post_enqueue=None) -> Entry:
        """Unconditional Enqueue (`spool.go:472-493`)."""
        acc, fb = _entry_size(msgs)
        if acc == 0:
            return Entry()
        with self._lock:
            if self._closed:
                raise RuntimeError("spool is closed")
            entry, cb = self._accept_locked(msgs, post_enqueue, acc, fb)
        if cb is not None:
            cb()
        return entry

    def _accept_locked(self, msgs, post_enqueue, acc, fb,
                       force_memory: bool = False):
        entry = Entry()
        entry.accounting_bytes = acc
        entry.file_bytes = fb
        should_spill = (not force_memory
                        and self._budget.should_spill(acc))
        if should_spill:
            blob = serialize_messages(msgs)
            entry.location = self._append_blob_locked(blob)
        else:
            entry.memory_msgs = list(msgs)
        # detachPostFlushCallbacks is the caller's concern here: we key
        # callbacks per entry, not per message
        above_high = self._budget.acquire(acc, should_spill)
        cb_to_run = None
        if post_enqueue is not None:
            if above_high:
                # quota.go: hold the callback until usage drops below
                # the low watermark
                self._post_enqueue_paused = True
                self._pending_post_enqueue.append(post_enqueue)
            else:
                cb_to_run = post_enqueue
        return entry, cb_to_run

    def _append_blob_locked(self, blob: bytes):
        seg = self._active_segment
        if seg is None or seg.size + len(blob) > self.segment_capacity:
            # roll to a fresh segment (`spool.go:683-703`)
            self._next_segment_id += 1
            path = os.path.join(
                self.work_dir, f"segment-{self._next_segment_id}.log")
            seg = _Segment(self._next_segment_id, path)
            self._segments[seg.id] = seg
            # an exhausted previous segment with no refs can go now
            prev = self._active_segment
            self._active_segment = seg
            self.rotated_count += 1
            if prev is not None and prev.ref_cnt == 0:
                self._remove_segment_locked(prev)
        offset = seg.size
        seg.file.seek(offset)
        seg.file.write(blob)
        seg.file.flush()
        seg.size += len(blob)
        seg.ref_cnt += 1
        return (seg.id, offset, len(blob))

    # -- load / release side

    def read_messages(self, entry: Entry):
        """NewMessageReader (`spool.go:535-607`): the entry's messages,
        from memory or read back from its segment file."""
        if entry is None or entry._consumed:
            return []
        if entry.memory_msgs is not None:
            return list(entry.memory_msgs)
        if entry.location is None:
            return []
        with self._lock:
            seg = self._segments.get(entry.location[0])
            if seg is None:
                raise KeyError(
                    f"spool segment {entry.location[0]} not found")
            f = seg.file
            _, offset, length = entry.location
        f.seek(offset)
        blob = f.read(length)
        return deserialize_messages(blob)

    def release(self, entry: Entry) -> None:
        """Release after a successful flush (`spool.go:609-640`)."""
        if entry is None or entry._consumed:
            return
        entry._consumed = True
        spilled = entry.location is not None
        to_run: list = []
        with self._lock:
            if self._closed:
                return
            if spilled:
                seg = self._segments.get(entry.location[0])
                if seg is not None:
                    seg.ref_cnt -= 1
                    if seg.ref_cnt == 0 and self._active_segment is not seg:
                        self._remove_segment_locked(seg)
            below_low = self._budget.release(entry.accounting_bytes, spilled)
            if below_low and self._pending_post_enqueue:
                to_run = self._pending_post_enqueue
                self._pending_post_enqueue = []
                self._post_enqueue_paused = False
            self._quota_cv.notify_all()
        for cb in to_run:
            cb()

    def discard(self, entry: Entry) -> None:
        """Run the entry's post-flush callbacks, then release — the
        flushed data is ignored (`spool.go:642-655`)."""
        if entry is None:
            return
        for cb in entry.post_flush_callbacks:
            cb()
        entry.post_flush_callbacks = []
        self.release(entry)

    def _remove_segment_locked(self, seg: _Segment) -> None:
        self._segments.pop(seg.id, None)
        try:
            seg.file.close()
            os.unlink(seg.path)
        except OSError:
            pass

    def close(self) -> None:
        """Idempotent; removes every segment file and the work dir
        (`spool.go:657-680`)."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            for seg in self._segments.values():
                try:
                    seg.file.close()
                except OSError:
                    pass
            self._segments.clear()
            self._active_segment = None
            self._quota_cv.notify_all()
        shutil.rmtree(self.work_dir, ignore_errors=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
