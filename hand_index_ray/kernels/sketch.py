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
