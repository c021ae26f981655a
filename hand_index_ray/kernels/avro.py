"""Apache Avro Object Container File codec — from the public spec
(https://avro.apache.org/docs/current/specification/), pure numpy +
stdlib. No avro library exists in this sandbox, so both directions are
implemented here:

* writer: OCF header (magic ``Obj\\x01``, metadata map with the JSON
  schema + codec, 16-byte sync), blocks of binary-encoded records,
  ``null`` or ``deflate`` (raw DEFLATE, wbits=-15) codec;
* reader: supported field types are null, boolean, int, long (both
  zigzag varints), float, double, string, bytes, and the 2-branch
  union ``["null", T]``.

Decode strategy (the 100 TB-relevant part): when every field of the
record is varint-shaped (null/boolean/int/long — booleans are 1-byte
varints, nulls are 0 bytes), the whole block is ONE self-delimiting
varint stream, so the block decodes with a single vectorized scan:
terminator bytes (high bit clear) mark varint ends, a grouped
horner-fold reconstructs values, and the result reshapes to
(records, fields) — no per-record Python. Length-delimited (string/
bytes) or fixed-width (float/double) fields make the stream
position-dependent, so those schemas fall back to a scalar cursor
(correct, per-block Python; blocks are bounded so the loop is too).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

import numpy as np

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic fixture sync marker

_VARINT_KINDS = {"null", "boolean", "int", "long"}


# ---------------------------------------------------------------------------
# primitive encode


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)) ^ (~(u & np.uint64(1)) + np.uint64(1))) \
        .astype(np.int64)


def _enc_long(v: int) -> bytes:
    u = _zigzag(int(v)) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_bytes(b: bytes) -> bytes:
    return _enc_long(len(b)) + b


def _field_kinds(schema: dict) -> list:
    """Per-field (name, kind) where kind is a type string or
    ('union', branch types)."""
    kinds = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            if len(t) != 2 or t[0] != "null":
                raise ValueError("only [null, T] unions supported")
            kinds.append((f["name"], ("union", t[1])))
        else:
            kinds.append((f["name"], t))
    return kinds


def _all_varint(kinds) -> bool:
    for _, k in kinds:
        if isinstance(k, tuple):
            if k[1] not in _VARINT_KINDS:
                return False
        elif k not in _VARINT_KINDS:
            return False
    return True


def encode_record(kinds, row: dict) -> bytes:
    out = bytearray()
    for name, k in kinds:
        v = row[name]
        if isinstance(k, tuple):  # [null, T] union
            if v is None:
                out += _enc_long(0)
                continue
            out += _enc_long(1)
            k = k[1]
        if k == "null":
            pass
        elif k == "boolean":
            out.append(1 if v else 0)
        elif k in ("int", "long"):
            out += _enc_long(v)
        elif k == "float":
            out += struct.pack("<f", v)
        elif k == "double":
            out += struct.pack("<d", v)
        elif k == "string":
            out += _enc_bytes(v.encode("utf-8"))
        elif k == "bytes":
            out += _enc_bytes(bytes(v))
        else:
            raise ValueError(f"unsupported avro type {k!r}")
    return bytes(out)


def write_ocf(path: str, schema: dict, rows: list, codec: str = "deflate",
              block_rows: int = 1000) -> None:
    """Write an Avro OCF. ``rows`` is a list of dicts matching
    ``schema`` (a record schema dict)."""
    kinds = _field_kinds(schema)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    out = io.BytesIO()
    out.write(MAGIC)
    out.write(_enc_long(len(meta)))
    for k, v in sorted(meta.items()):
        out.write(_enc_bytes(k.encode()))
        out.write(_enc_bytes(v))
    out.write(_enc_long(0))  # end of map
    out.write(SYNC)
    for i in range(0, max(len(rows), 1), block_rows):
        chunk = rows[i:i + block_rows]
        if not chunk:
            break
        data = b"".join(encode_record(kinds, r) for r in chunk)
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = co.compress(data) + co.flush()
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        out.write(_enc_long(len(chunk)))
        out.write(_enc_long(len(data)) + data)
        out.write(SYNC)
    with open(path, "wb") as f:
        f.write(out.getvalue())


# ---------------------------------------------------------------------------
# decode


def _scan_varints(buf: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Vectorized scan of a pure-varint stream: returns (values,
    end_offsets). Horner fold via per-varint segment ids."""
    if len(buf) == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64))
    term = buf < 0x80
    ends = np.flatnonzero(term)
    seg = np.cumsum(term) - term  # varint id per byte
    pos_in = np.arange(len(buf), dtype=np.int64)
    starts = np.concatenate([[0], ends[:-1] + 1])
    shift = (pos_in - starts[seg]) * 7
    contrib = (buf.astype(np.uint64) & np.uint64(0x7F)) \
        << shift.astype(np.uint64)
    vals = np.zeros(len(ends), np.uint64)
    np.add.at(vals, seg, contrib)
    return _unzigzag(vals), ends + 1


def _decode_block_varint(data: np.ndarray, kinds, count: int) -> dict:
    """Vectorized all-varint block decode → column dict."""
    vals, _ = _scan_varints(data)
    # per-record token counts vary with unions (absent branch = 1
    # token, present = 2): walk tokens column-wise per record using a
    # cursor array only when unions exist; otherwise pure reshape.
    has_union = any(isinstance(k, tuple) for _, k in kinds)
    n_fields = sum(0 if k == "null" else 1 for _, k in kinds)
    cols = {}
    if not has_union:
        toks = vals.reshape(count, n_fields) if count else \
            vals.reshape(0, n_fields)
        i = 0
        for name, k in kinds:
            if k == "null":
                cols[name] = np.zeros(count, np.int64)
                continue
            v = toks[:, i]
            i += 1
            if k == "boolean":
                # booleans are raw 0/1 bytes = zigzag-decoded -1/1? no:
                # byte 1 unzigzags to -1; recover the raw bit instead
                cols[name] = (v != 0)
            else:
                cols[name] = v
        return cols
    # union path: tokens-per-record varies with branch values, so
    # record starts are data-dependent. Resolve them vectorized:
    # (1) for EVERY token position t, compute len[t] = tokens one
    #     record would consume if it started at t (F vectorized
    #     gather steps — union branches read at data-dependent
    #     offsets within the hypothetical record);
    # (2) record starts are the orbit of 0 under t → t + len[t]:
    #     binary lifting (log₂ n gathers — the pointer-doubling trick
    #     kernels/flac.py uses for Rice runs) yields all `count`
    #     starts with no sequential walk.
    n_tok = len(vals)
    cap = n_tok + 1  # one-past-end sentinel for clamped gathers
    offs = np.zeros(n_tok, np.int64)
    t_idx = np.arange(n_tok, dtype=np.int64)
    for _, k in kinds:
        if k == "null":
            continue
        if isinstance(k, tuple):
            at = np.minimum(t_idx + offs, n_tok - 1)
            branch = vals[at]
            offs += 1 + (branch != 0)
        else:
            offs += 1
    nxt = np.minimum(t_idx + offs, cap - 1)
    nxt = np.append(nxt, cap - 1)  # sentinel self-ish loop at end
    # binary lifting: starts[i] = nxt^(i)(0)
    starts = np.zeros(count, np.int64)
    rec = np.arange(count, dtype=np.int64)
    jump = nxt
    bit = 0
    while (1 << bit) <= count:
        take = (rec >> bit) & 1 == 1
        if take.any():
            starts[take] = jump[starts[take]]
        jump = jump[jump]
        bit += 1
    cur = starts
    for fi, (name, k) in enumerate(kinds):
        if isinstance(k, tuple):
            branch = vals[cur]
            present = branch != 0
            val = np.zeros(count, np.int64)
            idx = cur + 1
            val[present] = vals[idx[present]]
            if k[1] == "boolean":
                cols[name] = np.where(present, val != 0, False)
            else:
                cols[name] = np.where(present, val, 0)
            cols[name + "__present"] = present
            cur = cur + 1 + present.astype(np.int64)
        elif k == "null":
            cols[name] = np.zeros(count, np.int64)
        elif k == "boolean":
            cols[name] = vals[cur] != 0
            cur += 1
        else:
            cols[name] = vals[cur].copy()
            cur += 1
    return cols


def _decode_block_scalar(data: bytes, kinds, count: int) -> dict:
    """Scalar cursor decode for schemas with strings/doubles."""
    pos = 0
    cols = {name: [] for name, _ in kinds}
    present_cols = {name for name, k in kinds if isinstance(k, tuple)}

    def read_long():
        nonlocal pos
        u = 0
        shift = 0
        while True:
            b = data[pos]
            pos += 1
            u |= (b & 0x7F) << shift
            if b < 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)

    for _ in range(count):
        for name, k in kinds:
            orig_k = k
            if isinstance(k, tuple):
                branch = read_long()
                if branch == 0:
                    cols[name].append(None)
                    continue
                k = k[1]
            if k == "null":
                cols[name].append(None)
            elif k == "boolean":
                cols[name].append(data[pos] != 0)
                pos += 1
            elif k in ("int", "long"):
                cols[name].append(read_long())
            elif k == "float":
                cols[name].append(struct.unpack_from("<f", data, pos)[0])
                pos += 4
            elif k == "double":
                cols[name].append(struct.unpack_from("<d", data, pos)[0])
                pos += 8
            elif k in ("string", "bytes"):
                ln = read_long()
                raw = bytes(data[pos:pos + ln])
                pos += ln
                cols[name].append(raw.decode("utf-8")
                                  if k == "string" else raw)
            else:
                raise ValueError(f"unsupported avro type {k!r}")
    return cols


def read_ocf(path: str) -> "tuple[dict, dict]":
    """Read an Avro OCF → (schema dict, column dict)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4

    def read_long_at(p):
        u = 0
        shift = 0
        while True:
            b = buf[p]
            p += 1
            u |= (b & 0x7F) << shift
            if b < 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1), p

    # metadata map (possibly multiple segments)
    meta = {}
    while True:
        n, pos = read_long_at(pos)
        if n == 0:
            break
        if n < 0:  # negative count: followed by byte size
            n = -n
            _, pos = read_long_at(pos)
        for _ in range(n):
            kl, pos = read_long_at(pos)
            key = buf[pos:pos + kl].decode()
            pos += kl
            vl, pos = read_long_at(pos)
            meta[key] = buf[pos:pos + vl]
            pos += vl
    sync = buf[pos:pos + 16]
    pos += 16
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    kinds = _field_kinds(schema)
    fast = _all_varint(kinds) and codec in ("null", "deflate")
    out_cols: dict = {}

    def merge(cols, count):
        for name, _ in kinds:
            base = cols.get(name)
            if name not in out_cols:
                out_cols[name] = []
            out_cols[name].append(base)
            pk = name + "__present"
            if pk in cols:
                out_cols.setdefault(pk, []).append(cols[pk])

    while pos < len(buf):
        count, pos = read_long_at(pos)
        size, pos = read_long_at(pos)
        block = buf[pos:pos + size]
        pos += size
        if buf[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        if fast:
            cols = _decode_block_varint(
                np.frombuffer(block, np.uint8), kinds, count)
        else:
            cols = _decode_block_scalar(block, kinds, count)
        merge(cols, count)

    final = {}
    for name, parts in out_cols.items():
        if not parts:
            final[name] = np.zeros(0, np.int64)
        elif isinstance(parts[0], np.ndarray):
            final[name] = np.concatenate(parts)
        else:
            final[name] = [v for p in parts for v in p]
    return schema, final
