"""S7 — binary mounter: decode TiDB RawKV row images into typed rows.

Reference: `pkg/common/event/mounter.go:44-151` — ``DecodeToChunk``
(`:69`) takes RawKVEntry{key, value, old_value}: the record key yields
the handle, a non-empty ``old_value`` decodes to the previous image, a
non-empty ``value`` to the current image, each dispatched on
``rowcodec.IsNewFormat`` (0x80 marker → v2, else the v1 datum list).
Op classification mirrors the mounter: both images → update, value
only → insert, old only → delete.

Spark shape: the decode is per-row Python (struct unpacking has no
Catalyst expression), so it runs as **Arrow-batched mapInPandas** —
the sanctioned slow-path pattern (SURVEY §2.6): one pass, no shuffle,
scales linearly with executors.  Everything downstream (filters,
routing, encode) stays JVM-side on the typed output.

``synthesize_binary_changelog`` is the inverse (testdata → RawKV
frames): it exists so the mount can be driven — and oracle-checked —
from the deterministic parquet changelog, and doubles as a golden
encoder for fixtures.  Every 4th row encodes in the v1 format so both
decode paths stay covered.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ticdc_spark.codec.rowcodec import (
    _VECTOR,
    CODEC_VER,
    _COMPACT_BYTES,
    _FLOAT,
    _JSON,
    _NIL,
    _VARINT,
    decode_record_key,
    decode_row_v1,
    decode_row_v2,
    decode_value,
    encode_record_key,
    encode_row_v1,
    encode_row_v2,
    encode_value,
    is_new_format,
)

# column meta for the canonical changelog payload (id/val/k)
PAYLOAD_COLUMNS = (
    {"id": 1, "name": "id", "type": "bigint"},
    {"id": 2, "name": "val", "type": "double"},
    {"id": 3, "name": "k", "type": "bigint"},
)

_V1_FLAGS = {"bigint": _VARINT, "double": _FLOAT,
             "string": _COMPACT_BYTES, "json": _JSON,
             "vector": _VECTOR}

RAWKV_SCHEMA = (
    "key binary, value binary, old_value binary, "
    "commit_ts long, start_ts long, seq long"
)


def _encode_image(row: dict, columns, use_v1: bool) -> bytes:
    if use_v1:
        vals = {}
        for c in columns:
            v = row.get(c["name"])
            if v is None:
                vals[c["id"]] = (_NIL, None)
            elif c["type"] == "string":
                # pre-encode with the column charset; v1 compactBytes
                # carries raw bytes
                vals[c["id"]] = (
                    _V1_FLAGS[c["type"]],
                    str(v).encode(c.get("charset") or "utf-8"),
                )
            elif c["type"] == "json":
                # v1 JSONFlag carries the binary JSON doc bytes
                vals[c["id"]] = (_JSON, encode_value(v, "json"))
            elif c["type"] == "vector":
                # v1 VectorFloat32Flag carries the serialized vector
                vals[c["id"]] = (_VECTOR, encode_value(v, "vector"))
            else:
                vals[c["id"]] = (_V1_FLAGS[c["type"]], v)
        return encode_row_v1(vals)
    vals = {}
    for c in columns:
        v = row.get(c["name"])
        vals[c["id"]] = None if v is None else encode_value(
            v, c["type"], charset=c.get("charset"))
    return encode_row_v2(vals)


def synthesize_binary_changelog(
    cl: DataFrame, columns=PAYLOAD_COLUMNS
) -> DataFrame:
    """Flat changelog → RawKV frames (the capture format the reference
    mounter consumes). Deterministic: row shape and v1/v2 choice depend
    only on (seq, op)."""
    names = [c["name"] for c in columns]

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                d = r._asdict()
                before = {n: d.get(f"before_{n}") for n in names}
                after = {n: d.get(f"after_{n}") for n in names}
                use_v1 = d["seq"] % 4 == 0
                op = d["op"]
                value = (
                    _encode_image(after, columns, use_v1)
                    if op in ("I", "U") else b""
                )
                old = (
                    _encode_image(before, columns, use_v1)
                    if op in ("U", "D") else b""
                )
                out.append((
                    encode_record_key(d["table_id"], d["pk"]),
                    value, old, d["commit_ts"], d["start_ts"], d["seq"],
                ))
            yield pd.DataFrame(
                out, columns=["key", "value", "old_value",
                              "commit_ts", "start_ts", "seq"],
            )

    src = cl.select(
        "table_id", "pk", "op", "commit_ts", "start_ts", "seq",
        *[c for c in cl.columns
          if c.startswith("before_") or c.startswith("after_")],
    )
    # spread before the per-row encode: the testdata parquet is one
    # split, so without this the whole encode+mount chain runs on one
    # task (scale_out precedent in sources/changelog.py — a real
    # multi-split capture scan parallelizes by itself)
    from ticdc_spark.sources.changelog import scale_out

    return scale_out(src).mapInPandas(encode, RAWKV_SCHEMA)


_ZERO_BY_TYPE = {"bigint": 0, "double": 0.0, "string": "", "json": "null"}


def _absent_fill(c: dict, handle):
    """A column id missing from the image entirely, in reference order
    (`chunk.go:134-161` tryDecodeFromHandle, `:182-238`
    getDefaultOrZeroValue): the handle column takes the record-key
    handle (clustered PK is not repeated in the row value); else the
    schema ORIGIN default; else NULL when nullable; else the type's
    zero value (empty string for char types)."""
    if c.get("handle") and handle is not None:
        return handle
    if c.get("default") is not None:
        return c["default"]
    if c.get("not_null"):
        return _ZERO_BY_TYPE.get(c["type"], 0)
    return None


def _decode_image(b: bytes, columns, handle=None) -> dict:
    if not b:
        return {}
    if is_new_format(b):
        raw = decode_row_v2(b)
        out = {}
        for c in columns:
            if c["id"] not in raw:
                # absence is distinguishable from stored NULL (the v2
                # null map is explicit) — fill per the reference rules
                out[c["name"]] = _absent_fill(c, handle)
                continue
            v = raw[c["id"]]
            out[c["name"]] = None if v is None else decode_value(
                v, c["type"], c.get("prec", 0), c.get("frac", 0),
                charset=c.get("charset"))
        return out
    raw = decode_row_v1(b)
    out = {}
    for c in columns:
        if c["id"] not in raw:
            out[c["name"]] = _absent_fill(c, handle)
            continue
        flag_v = raw[c["id"]]
        if flag_v[0] == _NIL:
            out[c["name"]] = None
        elif flag_v[0] == _JSON:
            out[c["name"]] = decode_value(flag_v[1], "json")
        elif flag_v[0] == _VECTOR:
            out[c["name"]] = decode_value(flag_v[1], "vector")
        elif flag_v[0] == _COMPACT_BYTES and c["type"] not in (
                "binary", "varbinary", "blob"):
            out[c["name"]] = flag_v[1].decode(c.get("charset") or "utf-8")
        else:
            out[c["name"]] = flag_v[1]
    return out


# ---------------------------------------------------------------------------
# Vectorized v2 fast path (VERDICT r2 next-round #8): rows that share
# the common fixed-schema signature — v2 marker, small layout, zero
# null-map entries, exactly the expected id set — decode with numpy
# batch slicing (header fields, offset tables, and fixed/int value
# gathers are fancy-indexed over ONE concatenated buffer instead of
# per-row struct unpacking).  Rows that miss the signature (v1 datum
# lists, big layout, nulls, absent columns) fall through to the exact
# per-row decoder, so output is byte-identical by construction; the
# equivalence is additionally fuzz-pinned in tests/test_binary_mount_fast.py.
# ---------------------------------------------------------------------------


def _compose_le_int(B, pos, width):
    """Little-endian signed int of `width` bytes gathered at B[pos]."""
    import numpy as np

    v = np.zeros(len(pos), dtype=np.uint64)
    for b in range(width):
        v |= B[pos + b].astype(np.uint64) << np.uint64(8 * b)
    v = v.astype(np.int64)
    if width < 8:
        sign = np.int64(1) << np.int64(8 * width - 1)
        v = (v ^ sign) - sign
    return v


def _decode_cmp_float_vec(B, pos):
    """Comparable-float decode (EncodeFloat inverse), vectorized."""
    import numpy as np

    u = np.zeros(len(pos), dtype=np.uint64)
    for b in range(8):
        u |= B[pos + b].astype(np.uint64) << np.uint64(8 * (7 - b))
    top = (u >> np.uint64(63)).astype(bool)
    flipped = np.where(top, u & ~(np.uint64(1) << np.uint64(63)), ~u)
    return flipped.view(np.float64)


def _fast_decode_side(raws: list, columns, out_vals: dict, prefix: str):
    """Fill ``out_vals[f"{prefix}_{name}"]`` (object arrays) for every
    row matching the fast signature; returns the boolean done-mask
    (absent images count as done — they stay None/{} semantics)."""
    import numpy as np

    n = len(raws)
    lens = np.fromiter(
        (len(r) if r is not None else 0 for r in raws), dtype=np.int64,
        count=n)
    present = lens > 0
    # absent images need no decode — their values stay None (the
    # per-row decoder's `{}` has identical .get() semantics)
    done = ~present
    ids = [c["id"] for c in columns]
    if not present.any() or sorted(ids) != ids or any(i > 255
                                                      for i in ids):
        return done
    ncols = len(ids)
    joined = b"".join(r for r in raws if r is not None)
    B = np.frombuffer(joined, dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    starts[present] = np.concatenate(
        ([0], np.cumsum(lens[present])[:-1]))
    idx = np.flatnonzero(present)
    s = starts[idx]
    # signature: 0x80 marker, flags==0 (small layout), numNull==0,
    # numNotNull==ncols, id bytes exactly the expected set
    hdr_ok = (lens[idx] >= 6 + ncols + 2 * ncols)
    fast = (hdr_ok & (B[s] == CODEC_VER) & (B[s + 1] == 0)
            & ((B[s + 2].astype(np.int64)
                | (B[s + 3].astype(np.int64) << 8)) == ncols)
            & ((B[s + 4].astype(np.int64)
                | (B[s + 5].astype(np.int64) << 8)) == 0))
    for j, cid in enumerate(ids):
        fast &= B[s + 6 + j] == cid
    if not fast.any():
        return done
    fi = idx[fast]
    sf = starts[fi]
    # offset table: u16 LE END offsets per value; values begin after it
    off_base = sf + 6 + ncols
    vstart = off_base + 2 * ncols
    prev_end = np.zeros(len(sf), dtype=np.int64)
    for j, c in enumerate(columns):
        end = (B[off_base + 2 * j].astype(np.int64)
               | (B[off_base + 2 * j + 1].astype(np.int64) << 8))
        a, b_ = vstart + prev_end, vstart + end
        col = out_vals[f"{prefix}_{c['name']}"]
        t = c["type"]
        if t == "double":
            col[fi] = _decode_cmp_float_vec(B, a).tolist()
        elif t == "bigint":
            widths = end - prev_end
            vals = np.zeros(len(a), dtype=np.int64)
            for w in (1, 2, 4, 8):
                m = widths == w
                if m.any():
                    vals[m] = _compose_le_int(B, a[m], w)
            col[fi] = vals.tolist()
        else:
            # strings/json: offsets are already vectorized; the value
            # itself needs a Python object — cheap slice per fast row
            if t in ("json", "vector"):
                col[fi] = [decode_value(joined[x:y], t)
                           for x, y in zip(a.tolist(), b_.tolist())]
            else:
                cs = c.get("charset") or "utf-8"
                col[fi] = [joined[x:y].decode(cs)
                           for x, y in zip(a.tolist(), b_.tolist())]
        prev_end = end
    done[fi] = True
    return done


def _decode_keys_vec(keys: list):
    """Record keys are fixed 19-byte frames — fully vectorized.
    Returns (table_ids, handles) int64 arrays, or None if any key
    deviates from the t{u64}_r{u64} layout."""
    import numpy as np

    n = len(keys)
    if any(k is None or len(k) != 19 for k in keys):
        return None
    K = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(n, 19)
    if not ((K[:, 0] == ord("t")).all() and (K[:, 9] == ord("_")).all()
            and (K[:, 10] == ord("r")).all()):
        return None

    def cmp64(block):
        u = np.zeros(n, dtype=np.uint64)
        for b in range(8):
            u |= block[:, b].astype(np.uint64) << np.uint64(8 * (7 - b))
        return (u ^ (np.uint64(1) << np.uint64(63))).astype(np.int64)

    return cmp64(K[:, 1:9]), cmp64(K[:, 11:19])


def mount_binary_rows(raw: DataFrame, columns=PAYLOAD_COLUMNS) -> DataFrame:
    """RawKV frames → typed changelog rows (DecodeToChunk analog).

    Output: (table_id, pk, op, commit_ts, start_ts, seq,
    before_<col>..., after_<col>...) — the flat changelog shape the
    rest of the pipeline consumes."""
    names = [c["name"] for c in columns]
    spark_types = {"bigint": "long", "double": "double", "string": "string"}
    payload_ddl = ", ".join(
        f"before_{c['name']} {spark_types.get(c['type'], 'string')}, "
        f"after_{c['name']} {spark_types.get(c['type'], 'string')}"
        for c in columns
    )
    schema = ("table_id long, pk long, op string, commit_ts long, "
              f"start_ts long, seq long, {payload_ddl}")

    out_cols = (["table_id", "pk", "op", "commit_ts", "start_ts", "seq"]
                + [f"{side}_{n}" for n in names
                   for side in ("before", "after")])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # vectorized fast path over one concatenated buffer; rows that
        # miss the fixed-schema signature (v1 datum lists, big layout,
        # nulls, absent columns) take the exact per-row decoder
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            keys = [bytes(k) for k in pdf["key"]]
            values = [bytes(v) if v is not None and len(v) else None
                      for v in pdf["value"]]
            olds = [bytes(v) if v is not None and len(v) else None
                    for v in pdf["old_value"]]
            out_vals = {f"{p}_{c['name']}": np.empty(n, dtype=object)
                        for p in ("before", "after") for c in columns}
            kv = _decode_keys_vec(keys)
            if kv is not None:
                table_ids, handles = kv[0].tolist(), kv[1].tolist()
            else:
                decoded = [decode_record_key(k) for k in keys]
                table_ids = [d[0] for d in decoded]
                handles = [d[1] for d in decoded]
            done_after = _fast_decode_side(values, columns, out_vals,
                                           "after")
            done_before = _fast_decode_side(olds, columns, out_vals,
                                            "before")
            for prefix, raws, done in (("after", values, done_after),
                                       ("before", olds, done_before)):
                for i in np.flatnonzero(~done).tolist():
                    img = _decode_image(raws[i], columns, handles[i])
                    for c in columns:
                        out_vals[f"{prefix}_{c['name']}"][i] = \
                            img.get(c["name"])
            has_v = np.fromiter((v is not None for v in values),
                                dtype=bool, count=n)
            has_o = np.fromiter((v is not None for v in olds),
                                dtype=bool, count=n)
            # mounter op classification: old+new=U, new=I, old=D
            ops = np.where(has_v & has_o, "U",
                           np.where(has_v, "I", "D"))
            cols: dict = {
                "table_id": table_ids, "pk": handles,
                "op": ops.tolist(),
                "commit_ts": pdf["commit_ts"].to_numpy(),
                "start_ts": pdf["start_ts"].to_numpy(),
                "seq": pdf["seq"].to_numpy(),
            }
            cols.update(out_vals)
            yield pd.DataFrame(cols, columns=out_cols)

    return raw.mapInPandas(decode, schema)
