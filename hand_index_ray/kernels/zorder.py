"""Z-order (Morton) spatial indexing — interleaved-bit keys + exact
bbox range covers. The scale story: sort (or hive-partition) a corpus
by its Morton key ONCE, and every bbox query becomes a handful of
CONTIGUOUS key ranges — parquet row-group pruning / file pruning on a
sorted column replaces an all-files scan. This complements the
H3/S2 cell family (kernels/h3exact.py, s2.py): cells give equal-area
hierarchical ids; Morton gives a total order with range-expressible
rectangles (the classic linear-quadtree construction — public
knowledge, e.g. the Gargantini linear-quadtree papers and the
LITMAX/BIGMIN range-splitting literature).

All kernels are vectorized uint64 bit arithmetic (the standard
parallel-prefix bit-spread), bits ≤ 16 per axis (32-bit keys compose
to 64-bit for two levels if ever needed).
"""

from __future__ import annotations

import numpy as np

_SPREAD_MASKS = (
    (0x0000FFFF0000FFFF, 16),
    (0x00FF00FF00FF00FF, 8),
    (0x0F0F0F0F0F0F0F0F, 4),
    (0x3333333333333333, 2),
    (0x5555555555555555, 1),
)


def _spread(v: np.ndarray) -> np.ndarray:
    """Insert a 0 bit between every bit of v (v < 2^32)."""
    v = v.astype(np.uint64)
    for mask, shift in _SPREAD_MASKS:
        v = (v | (v << np.uint64(shift))) & np.uint64(mask)
    return v


# masks after each compaction step (standard parallel-suffix)
_COMPACT_STEPS = ((1, 0x3333333333333333), (2, 0x0F0F0F0F0F0F0F0F),
                  (4, 0x00FF00FF00FF00FF), (8, 0x0000FFFF0000FFFF),
                  (16, 0x00000000FFFFFFFF))


def _compact(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread: keep every second bit, pack."""
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    for shift, mask in _COMPACT_STEPS:
        v = (v | (v >> np.uint64(shift))) & np.uint64(mask)
    return v


def encode(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton keys: bit i of x lands at key bit 2i+1, y at 2i."""
    return (_spread(np.asarray(x)) << np.uint64(1)) | _spread(np.asarray(y))


def decode(key: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    k = np.asarray(key, dtype=np.uint64)
    return (_compact(k >> np.uint64(1)).astype(np.int64),
            _compact(k).astype(np.int64))


def bbox_ranges(x0: int, y0: int, x1: int, y1: int, bits: int,
                max_ranges: int = 64) -> np.ndarray:
    """EXACT cover of the inclusive rect [x0..x1]×[y0..y1] as merged
    inclusive Morton-key ranges, by quadtree decomposition: a quadrant
    fully inside the rect contributes its whole contiguous key block;
    partial quadrants recurse. ``max_ranges`` caps fragmentation by
    coarsening (ranges may then over-cover; callers re-verify exactly,
    the same contract as the kNN ring scan). Returns (n, 2) int64
    [lo, hi] sorted, non-overlapping, coalesced."""
    spans: list[tuple[int, int, bool]] = []

    def rec(qx: int, qy: int, level: int):
        # quadrant at `level` has side 2^level, origin (qx, qy)
        side = 1 << level
        ax0, ay0 = qx, qy
        ax1, ay1 = qx + side - 1, qy + side - 1
        if ax1 < x0 or ax0 > x1 or ay1 < y0 or ay0 > y1:
            return
        base = int(encode(np.array([ax0]), np.array([ay0]))[0])
        if x0 <= ax0 and ax1 <= x1 and y0 <= ay0 and ay1 <= y1:
            spans.append((base, base + side * side - 1, True))
            return
        if level == 0:
            spans.append((base, base, True))
            return
        half = side >> 1
        for dx in (0, half):
            for dy in (0, half):
                rec(qx + dx, qy + dy, level - 1)

    rec(0, 0, bits)
    spans.sort()
    # coalesce adjacent key blocks (quadtree emits them in key order)
    merged: list[list[int]] = []
    for lo, hi, _ in spans:
        if merged and lo == merged[-1][1] + 1:
            merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    while len(merged) > max_ranges:
        # coarsen: merge the pair with the smallest gap (over-cover);
        # the caller's exact re-verify keeps results correct
        gaps = [merged[i + 1][0] - merged[i][1]
                for i in range(len(merged) - 1)]
        i = int(np.argmin(gaps))
        merged[i][1] = merged[i + 1][1]
        del merged[i + 1]
    return np.asarray(merged, dtype=np.int64).reshape(-1, 2)


def keys_in_ranges(keys: np.ndarray, ranges: np.ndarray) -> np.ndarray:
    """Boolean mask: key ∈ any [lo, hi] — one searchsorted over the
    flattened sorted bounds (vectorized, no per-range loop)."""
    if len(ranges) == 0:
        return np.zeros(len(keys), dtype=bool)
    keys = np.asarray(keys, dtype=np.int64)
    starts = ranges[:, 0]
    idx = np.searchsorted(starts, keys, side="right") - 1
    ok = idx >= 0
    out = np.zeros(len(keys), dtype=bool)
    out[ok] = keys[ok] <= ranges[idx[ok], 1]
    return out
