"""Google Encoded Polyline Algorithm Format — from the public spec.

The interchange format for GPS tracks in web mapping APIs: each
coordinate pair encodes as deltas from the previous point, each delta
zigzag-mapped to unsigned, split into 5-bit chunks little-endian, each
chunk + 63 into printable ASCII with bit 0x20 as the continuation flag.

To keep the codec exact (and SQL-oracle-reproducible), the API takes
fixed-point integers (coordinate × 1e5 already rounded by the caller)
— the spec's only float step is that scaling, and owning it here would
re-open rounding parity questions the rest of this engine avoids.

Both directions are fully vectorized: encoding builds the chunk matrix
for all deltas at once (≤7 chunks for int32-range values) and gathers
the surviving bytes; decoding segments the byte stream on the
continuation bit with one cumsum.

Reference analog: the reference emits GeoJSON tracks
(/root/reference/query_geojson.py); polyline is the wire-compact
sibling for the same geometry.
"""

from __future__ import annotations

import numpy as np

_MAX_CHUNKS = 7  # ceil(32/5): covers the full zigzagged int32 range


def _zigzag(d: np.ndarray) -> np.ndarray:
    d = d.astype(np.int64)
    return np.where(d >= 0, d << 1, (-d << 1) - 1).astype(np.int64)


def _unzigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v & 1, -((v + 1) >> 1), v >> 1).astype(np.int64)


def encode_values(vals: np.ndarray, return_counts: bool = False):
    """Encode a flat array of already-delta'd signed values.

    With ``return_counts`` also returns the per-value byte count —
    lets a caller encode MANY tracks' deltas in one call and split the
    byte stream afterwards (the vectorized bucket path)."""
    v = _zigzag(np.asarray(vals, dtype=np.int64))
    n = len(v)
    if n == 0:
        return (b"", np.empty(0, np.int64)) if return_counts else b""
    sh = (v[:, None] >> (5 * np.arange(_MAX_CHUNKS)[None, :])) & 31
    # chunk i is emitted iff any chunk >= i is nonzero (always chunk 0)
    live = sh > 0
    nchunks = np.maximum(
        _MAX_CHUNKS - np.argmax(live[:, ::-1], axis=1), 1)
    nchunks[~live.any(axis=1)] = 1
    keep = np.arange(_MAX_CHUNKS)[None, :] < nchunks[:, None]
    cont = np.arange(_MAX_CHUNKS)[None, :] < (nchunks - 1)[:, None]
    chars = (sh + 63 + 32 * cont).astype(np.uint8)
    out = chars[keep].tobytes()
    return (out, nchunks.astype(np.int64)) if return_counts else out


def decode_values(buf: bytes) -> np.ndarray:
    """Decode a polyline byte string back to the flat delta values."""
    b = np.frombuffer(buf, dtype=np.uint8).astype(np.int64) - 63
    if len(b) == 0:
        return np.empty(0, np.int64)
    cont = (b & 32) > 0
    chunk = b & 31
    # value id = count of completed values before this byte
    ends = ~cont
    vid = np.concatenate(([0], np.cumsum(ends)[:-1]))
    # position of each chunk within its value
    starts = np.concatenate(([True], ends[:-1]))
    pos = np.arange(len(b)) - np.maximum.accumulate(
        np.where(starts, np.arange(len(b)), 0))
    nvals = int(ends.sum())
    out = np.zeros(nvals, np.int64)
    np.add.at(out, vid, chunk << (5 * pos))
    return _unzigzag(out)


def encode_track(lat5: np.ndarray, lng5: np.ndarray) -> bytes:
    """Encode one track of fixed-point (×1e5) integer coordinates."""
    lat5 = np.asarray(lat5, dtype=np.int64)
    lng5 = np.asarray(lng5, dtype=np.int64)
    dl = np.diff(lat5, prepend=0)
    dg = np.diff(lng5, prepend=0)
    inter = np.empty(2 * len(lat5), np.int64)
    inter[0::2] = dl
    inter[1::2] = dg
    return encode_values(inter)


def decode_track(buf: bytes) -> "tuple[np.ndarray, np.ndarray]":
    """Decode a polyline string to fixed-point coordinate arrays."""
    vals = decode_values(buf)
    lat = np.cumsum(vals[0::2])
    lng = np.cumsum(vals[1::2])
    return lat, lng


_B64 = np.frombuffer(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/",
    dtype=np.uint8)


def base64_encode(data: bytes) -> bytes:
    """RFC 4648 base64, vectorized: reshape to 3-byte groups, emit the
    four 6-bit symbols per group, '=' padding. (Lives beside the
    polyline codec as the second from-scratch text-armoring kernel.)"""
    a = np.frombuffer(data, dtype=np.uint8)
    n = len(a)
    if n == 0:
        return b""
    pad = (-n) % 3
    a3 = np.concatenate([a, np.zeros(pad, np.uint8)]).reshape(-1, 3) \
        .astype(np.uint32)
    word = (a3[:, 0] << 16) | (a3[:, 1] << 8) | a3[:, 2]
    idx = np.stack([(word >> 18) & 63, (word >> 12) & 63,
                    (word >> 6) & 63, word & 63], axis=1)
    out = _B64[idx.ravel()]
    if pad:
        out[-pad:] = ord("=")
    return out.tobytes()
