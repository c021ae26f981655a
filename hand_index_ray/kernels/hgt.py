"""SRTM .hgt elevation tiles — the public raw DEM interchange format.

An .hgt file is exactly n×n big-endian signed 16-bit samples, row
major from the north-west corner, where n is 1201 (SRTM3, 3-arcsecond)
or 3601 (SRTM1); the void value is -32768. The tile's SW corner is
encoded in the FILENAME (e.g. N34W119.hgt) — the format has no header
at all, which is why a reader must infer n from the byte length.

This engine treats .hgt blobs like any other opaque payload column:
decode in map_batches, emit ledger rows. Reference analog: the HAND
DEM rasters the reference catalogs (load.py raster inputs).
"""

from __future__ import annotations

import math
import re

import numpy as np

VOID = -32768

_NAME = re.compile(r"([NS])(\d{1,2})([EW])(\d{1,3})\.hgt$", re.IGNORECASE)


def encode_hgt(grid: np.ndarray) -> bytes:
    """n×n int16 grid → raw big-endian .hgt bytes."""
    g = np.asarray(grid)
    assert g.ndim == 2 and g.shape[0] == g.shape[1], g.shape
    return g.astype(">i2").tobytes()


def decode_hgt(buf: bytes) -> np.ndarray:
    """Raw .hgt bytes → n×n int16 grid (n inferred from length)."""
    a = np.frombuffer(buf, dtype=">i2")
    n = math.isqrt(len(a))
    if n * n != len(a):
        raise ValueError(f"not square: {len(a)} samples")
    return a.reshape(n, n).astype(np.int16)


def corner_from_name(name: str) -> "tuple[int, int]":
    """SW corner (lat, lon) in integer degrees from an .hgt filename."""
    m = _NAME.search(name)
    if not m:
        raise ValueError(f"not an hgt name: {name}")
    lat = int(m.group(2)) * (1 if m.group(1).upper() == "N" else -1)
    lon = int(m.group(4)) * (1 if m.group(3).upper() == "E" else -1)
    return lat, lon
