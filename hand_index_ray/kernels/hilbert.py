"""Hilbert-curve spatial indexing — the 4th cell/key family next to
H3 (kernels/h3exact.py), S2 (kernels/s2.py), geohash
(kernels/geohash.py) and Z-order (kernels/zorder.py).

Hilbert keys have the same sort-once/range-scan scale story as Morton
(a total order over the plane; bbox queries become contiguous key
ranges on a sorted parquet column) but strictly better locality: every
pair of CONSECUTIVE keys is a unit grid step (Manhattan distance 1),
so a key range of length L covers a region of diameter O(√L) — Morton
ranges can jump across the plane at quadrant seams. The construction
is the classic iterated base-4 Gray-code / quadrant-rotation algorithm
(public knowledge — Hilbert 1891; the iterative bit formulation
follows the well-known xy2d/d2xy quadrant-rotation recurrences).

Both kernels are vectorized int64 bit arithmetic: one pass over the
``order`` bit levels (≤ 31), each level a handful of numpy ops over
the whole array — no per-point Python. Correctness is pinned by
tests/test_zorder.py: bijection over the full grid, unit-step
adjacency of consecutive keys, quadrant recursion, and encode/decode
roundtrip (the adjacency property is exactly what a "Hilbert" curve
must satisfy and what Morton lacks).
"""

from __future__ import annotations

import numpy as np


def encode(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Hilbert distance d of integer points (x, y), 0 ≤ x, y < 2^order.

    Iterates bit levels high→low; at each level the quadrant bit pair
    (rx, ry) contributes s²·gray(rx, ry) to d and the LOW bits are
    re-framed into that quadrant's canonical orientation (swap for the
    bottom-left quadrant, flip+swap for the bottom-right)."""
    x = np.asarray(x).astype(np.int64).copy()
    y = np.asarray(y).astype(np.int64).copy()
    d = np.zeros(x.shape, np.int64)
    for i in range(order - 1, -1, -1):
        s = np.int64(1) << i
        rx = (x >> i) & 1
        ry = (y >> i) & 1
        # quadrant order (rx,ry): (0,0)→0, (0,1)→1, (1,1)→2, (1,0)→3
        d += s * s * ((3 * rx) ^ ry)
        xl = x & (s - 1)
        yl = y & (s - 1)
        flip = (ry == 0) & (rx == 1)
        swap = ry == 0
        xf = np.where(flip, s - 1 - xl, xl)
        yf = np.where(flip, s - 1 - yl, yl)
        x = np.where(swap, yf, xf)
        y = np.where(swap, xf, yf)
    return d


def decode(d: np.ndarray, order: int) -> "tuple[np.ndarray, np.ndarray]":
    """Inverse of :func:`encode` — (x, y) of each Hilbert distance.

    Builds coordinates low level → high level, applying the inverse
    rotation BEFORE adding each level's quadrant offset."""
    d = np.asarray(d).astype(np.int64)
    x = np.zeros(d.shape, np.int64)
    y = np.zeros(d.shape, np.int64)
    for i in range(order):
        s = np.int64(1) << i
        q = (d >> (2 * i)) & 3          # gray(rx, ry) at this level
        rx = (q == 2) | (q == 3)
        ry = (q == 1) | (q == 2)
        rxi = rx.astype(np.int64)
        ryi = ry.astype(np.int64)
        flip = ~ry & rx
        swap = ~ry
        # inverse of the encode re-framing: un-swap, then un-flip
        xs = np.where(swap, y, x)
        ys = np.where(swap, x, y)
        x = np.where(flip, s - 1 - xs, xs)
        y = np.where(flip, s - 1 - ys, ys)
        x = x + s * rxi
        y = y + s * ryi
    return x, y
