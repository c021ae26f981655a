"""Mergeable sketches — HyperLogLog distinct-count, numpy only.

The reference needs no approximate aggregates (SURVEY.md §2.5), but a
100 TB training-data pipeline does: exact COUNT(DISTINCT) over 10¹²
keys is a full shuffle, while HLL sketches are ~2^p bytes, mergeable,
and shuffle-free (one small sketch per batch, one reduce). Standard
HLL (Flajolet et al.) with the usual small-range linear counting
correction; register hash = splitmix64 (deterministic across
processes).
"""

from __future__ import annotations

import numpy as np

from ..sources.synth import splitmix64

P = 12  # 4096 registers → ~1.6% standard error
M = 1 << P
_ALPHA = 0.7213 / (1.0 + 1.079 / M)


def empty() -> np.ndarray:
    return np.zeros(M, dtype=np.uint8)


def add_hashed(reg: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold pre-hashed uint64 values into the register array."""
    h = np.asarray(hashes, dtype=np.uint64)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = (h << np.uint64(P)) | np.uint64((1 << P) - 1)  # pad tail with ones
    # leading zeros via exact integer bit-length (no float, no 2^64
    # rounding edge case): bl = position of highest set bit + 1
    bl = np.zeros(len(h), dtype=np.int64)
    tmp = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = tmp >= (np.uint64(1) << np.uint64(shift))
        bl[m] += shift
        tmp[m] >>= np.uint64(shift)
    bl += tmp.astype(np.int64)  # remaining bit (0 or 1)
    lz = 64 - bl
    rank = np.clip(lz + 1, 1, 64 - P + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def add(reg: np.ndarray, values) -> np.ndarray:
    """Fold raw values (ints or strings) into the sketch."""
    import zlib

    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        h = splitmix64(arr.astype(np.uint64))
    else:
        h = splitmix64(np.array([zlib.crc32(str(v).encode()) * 2654435761 for v in values],
                                dtype=np.uint64))
    return add_hashed(reg, h)


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(reg: np.ndarray) -> float:
    reg = reg.astype(np.float64)
    est = _ALPHA * M * M / np.sum(2.0 ** (-reg))
    zeros = float((reg == 0).sum())
    if est <= 2.5 * M and zeros > 0:
        est = M * np.log(M / zeros)  # linear counting, small range
    return float(est)


# ---------------------------------------------------------------------------
# sparse/dense tagged HLL state — exact below SPARSE_MAX distinct values
#
# Production HLLs (Redis, BigQuery, DataSketches) keep an exact sparse
# set of hashes until it outgrows a threshold, then promote to the
# dense register array: small-cardinality answers are EXACT, large
# ones degrade gracefully to the ~1.6% dense estimate, and partials
# stay mergeable in any mix of representations. splitmix64 is a
# bijection on uint64, so for integer inputs the sparse count is the
# true distinct count (no collision regime at all); only string inputs
# carry the hash-collision caveat. Serialized form: 1 tag byte + the
# representation's bytes.

SPARSE_MAX = 4096  # 32 KB worst-case sparse payload; dense is 4 KB


def state_empty() -> tuple:
    return ("sparse", np.empty(0, dtype=np.uint64))


def _promote(hashes: np.ndarray) -> np.ndarray:
    return add_hashed(empty(), hashes)


def state_add_hashed(state: tuple, hashes: np.ndarray) -> tuple:
    tag, payload = state
    h = np.asarray(hashes, dtype=np.uint64)
    if tag == "dense":
        return ("dense", add_hashed(payload, h))
    u = np.union1d(payload, h)  # sorted distinct union
    if len(u) > SPARSE_MAX:
        return ("dense", _promote(u))
    return ("sparse", u)


def state_add(state: tuple, values) -> tuple:
    import zlib

    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        h = splitmix64(arr.astype(np.uint64))
    else:
        h = splitmix64(np.array([zlib.crc32(str(v).encode()) * 2654435761 for v in values],
                                dtype=np.uint64))
    return state_add_hashed(state, h)


def state_merge(a: tuple, b: tuple) -> tuple:
    if a[0] == "sparse" and b[0] == "sparse":
        u = np.union1d(a[1], b[1])
        if len(u) > SPARSE_MAX:
            return ("dense", _promote(u))
        return ("sparse", u)
    da = a[1] if a[0] == "dense" else _promote(a[1])
    db = b[1] if b[0] == "dense" else _promote(b[1])
    return ("dense", merge(da, db))


def state_estimate(state: tuple) -> float:
    tag, payload = state
    if tag == "sparse":
        return float(len(payload))  # EXACT (bijective hash for ints)
    return estimate(payload)


def state_serialize(state: tuple) -> bytes:
    tag, payload = state
    return (b"s" if tag == "sparse" else b"d") + payload.tobytes()


def state_deserialize(buf: bytes) -> tuple:
    if buf[:1] == b"s":
        return ("sparse", np.frombuffer(buf[1:], dtype=np.uint64).copy())
    return ("dense", np.frombuffer(buf[1:], dtype=np.uint8).copy())


# ---------------------------------------------------------------------------
# mergeable approximate quantiles (GK-lite / compressed sample sketch)
#
# A deterministic compressed-quantile sketch in the style of
# Greenwald-Khanna / KLL: each partial holds at most ``2k`` sorted
# values chosen as evenly-spaced order statistics of what it has seen,
# plus the total count. Merging concatenates weighted samples and
# recompresses to k evenly-spaced quantile points. Rank error is
# O(1/k); with k=512 the p50/p90/p99 of a 10^12-row column come back
# within ~0.2% rank error — and the sketch is a few KB, so the whole
# aggregation is shuffle-free (partials merge on the driver exactly
# like the HLL above).


QK = 512


def q_empty() -> "tuple[np.ndarray, np.ndarray, int]":
    """(values, weights, count) — empty quantile sketch."""
    return np.empty(0, np.float64), np.empty(0, np.float64), 0


def _q_compress(vals: np.ndarray, wts: np.ndarray, k: int = QK):
    """Reduce a weighted sorted sample to k evenly-spaced quantile
    points (each kept point carries the weight of its span)."""
    if len(vals) <= k:
        return vals, wts
    cw = np.cumsum(wts)
    total = cw[-1]
    # pick the value at each target cumulative rank; weight = span size
    targets = (np.arange(k) + 0.5) / k * total
    idx = np.searchsorted(cw, targets)
    idx = np.minimum(idx, len(vals) - 1)
    uniq = np.unique(idx)
    # weight of kept point j = mass up to and including it since the
    # previously kept point (the ≤ total/2k tail above the last kept
    # point is dropped — within the sketch's rank-error budget)
    w = np.diff(np.concatenate([[0.0], cw[uniq]]))
    return vals[uniq], w


def q_add(state, values: np.ndarray):
    vals, wts, n = state
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if len(v) == 0:
        return state
    allv = np.concatenate([vals, v])
    allw = np.concatenate([wts, np.ones(len(v))])
    o = np.argsort(allv, kind="stable")
    cv, cw = _q_compress(allv[o], allw[o])
    return cv, cw, n + len(v)


def q_merge(a, b):
    av, aw, an = a
    bv, bw, bn = b
    allv = np.concatenate([av, bv])
    allw = np.concatenate([aw, bw])
    if len(allv) == 0:
        return q_empty()
    o = np.argsort(allv, kind="stable")
    cv, cw = _q_compress(allv[o], allw[o])
    return cv, cw, an + bn


def q_quantile(state, q) -> np.ndarray:
    """Estimate quantile(s) q in [0, 1] from the sketch."""
    vals, wts, n = state
    qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
    if len(vals) == 0:
        return np.full(len(qs), np.nan)
    cw = np.cumsum(wts)
    total = cw[-1]
    idx = np.searchsorted(cw, qs * total)
    return vals[np.minimum(idx, len(vals) - 1)]


def q_serialize(state) -> bytes:
    vals, wts, n = state
    head = np.array([len(vals), n], dtype=np.int64).tobytes()
    return head + vals.tobytes() + wts.tobytes()


def q_deserialize(buf: bytes):
    m, n = np.frombuffer(buf[:16], dtype=np.int64)
    m = int(m)
    vals = np.frombuffer(buf[16:16 + 8 * m], dtype=np.float64).copy()
    wts = np.frombuffer(buf[16 + 8 * m:16 + 16 * m], dtype=np.float64).copy()
    return vals, wts, int(n)


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters: mergeable (items, counts) summaries.
#
# Invariant: for every item, true_count − err ≤ count ≤ true_count with
# err ≤ N/(capacity+1) (Misra–Gries 1982; merge per Agarwal et al. 2013,
# "Mergeable Summaries"). When the stream's DISTINCT count never
# exceeds `capacity`, no decrement ever fires and every count is EXACT
# — the regime the driver oracle checks (same pattern as the HLL's
# sparse-exact regime).

MG_CAPACITY = 4096


def mg_empty() -> "tuple[np.ndarray, np.ndarray]":
    return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)


def mg_from_counts(items: np.ndarray, counts: np.ndarray,
                   capacity: int = MG_CAPACITY):
    """Reduce an exact (items, counts) table to ≤capacity MG counters:
    keep the top-capacity by count, subtract the (capacity+1)-th count
    from the survivors (the batched form of the MG decrement)."""
    if len(items) <= capacity:
        return np.asarray(items, dtype=object), counts.astype(np.int64)
    order = np.argsort(counts, kind="stable")[::-1]
    thresh = counts[order[capacity]]
    keep = order[:capacity]
    kept = counts[keep] - thresh
    pos = kept > 0
    return np.asarray(items[keep][pos], dtype=object), kept[pos].astype(np.int64)


def mg_add(state, values, capacity: int = MG_CAPACITY):
    """Fold a batch of raw values into the summary (exact per-batch
    count, then one merge)."""
    items, counts = np.unique(np.asarray(values, dtype=object),
                              return_counts=True)
    return mg_merge(state, (items, counts.astype(np.int64)), capacity)


def mg_merge(a, b, capacity: int = MG_CAPACITY):
    """Merge two summaries: sum counts item-wise, then re-reduce."""
    items = np.concatenate([a[0], b[0]])
    counts = np.concatenate([a[1], b[1]])
    if len(items) == 0:
        return mg_empty()
    uniq, inv = np.unique(items, return_inverse=True)
    summed = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(summed, inv, counts)
    return mg_from_counts(uniq, summed, capacity)


def mg_topk(state, k: int):
    """Top-k (count desc, item asc tiebreak) from the summary."""
    items, counts = state
    if len(items) == 0:
        return items, counts
    order = np.lexsort((items, -counts))[:k]
    return items[order], counts[order]


def mg_serialize(state) -> bytes:
    import pickle

    return pickle.dumps((list(state[0]), state[1].tolist()))


def mg_deserialize(buf: bytes):
    import pickle

    items, counts = pickle.loads(buf)
    return np.asarray(items, dtype=object), np.asarray(counts, dtype=np.int64)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): depth x width counter
# matrix, point estimate = min over rows. Mergeable by elementwise sum —
# the shuffle-free frequency sibling of the HLL above and the
# Misra-Gries summary below. In the engine's test regime (distinct keys
# << width) every key has at least one collision-free row, so estimates
# are EXACT and a plain COUNT GROUP BY oracles them; the sketch's value
# at 100 TB is that each batch contributes one fixed-size matrix
# regardless of row count.


def cms_empty(width: int = 2048, depth: int = 4) -> np.ndarray:
    return np.zeros((depth, width), dtype=np.int64)


def _cms_rows(hashes: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(depth, n) column indices for pre-hashed uint64 keys — row d
    re-mixes with splitmix64(h ^ seed_d) so rows are independent."""
    from ..sources.synth import splitmix64

    out = np.empty((depth, len(hashes)), dtype=np.int64)
    with np.errstate(over="ignore"):
        for d in range(depth):
            out[d] = (splitmix64(hashes ^ np.uint64(0xC0FFEE + d * 0x9E37))
                      % np.uint64(width)).astype(np.int64)
    return out


def cms_add_hashed(sk: np.ndarray, hashes: np.ndarray,
                   counts: "np.ndarray | None" = None) -> np.ndarray:
    depth, width = sk.shape
    idx = _cms_rows(np.asarray(hashes, dtype=np.uint64), width, depth)
    w = np.ones(len(hashes), np.int64) if counts is None \
        else np.asarray(counts, dtype=np.int64)
    for d in range(depth):
        np.add.at(sk[d], idx[d], w)
    return sk


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cms_query_hashed(sk: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point estimates (upper bounds; exact when some row is
    collision-free for the key) for pre-hashed uint64 keys."""
    depth, width = sk.shape
    idx = _cms_rows(np.asarray(hashes, dtype=np.uint64), width, depth)
    est = sk[0][idx[0]]
    for d in range(1, depth):
        est = np.minimum(est, sk[d][idx[d]])
    return est.astype(np.int64)
