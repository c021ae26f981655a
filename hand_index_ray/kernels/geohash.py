"""Geohash cell encoding — the third public hierarchical cell id
(alongside H3 in kernels/h3exact.py and S2 in kernels/s2.py; the
reference keys its spatial partitions on hierarchical cells,
load.py:164-168).

A geohash is the base-32 string of the bit-interleaved binary
bisection of (lon, lat), longitude first. Computed here EXACTLY from
integer-microdegree coordinates: quantization is one integer
multiply-shift-divide per axis (no float round-trip, so the SQL
oracle can reproduce every bit), interleave is the Morton spread from
kernels/zorder.py.
"""
from __future__ import annotations

import numpy as np

from .zorder import _spread

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"  # published geohash alphabet


def encode_udeg(lat_udeg: np.ndarray, lon_udeg: np.ndarray,
                precision: int) -> "tuple[np.ndarray, np.ndarray]":
    """Geohash of integer-microdegree points at ``precision`` chars
    (≤ 12). Returns ``(codes, strings)``: the raw interleaved code as
    uint64 (the sortable cell key — prefix ranges are contiguous) and
    the base-32 strings.

    Bit layout (the published rule): total bits = 5·precision,
    alternating lon, lat from the MSB, lon first — so lon gets
    ⌈bits/2⌉ bisections and lat ⌊bits/2⌋. Quantized cell index along
    each axis is floor((v − min) · 2^axis_bits / span), all integer.
    """
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12")
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    lat = np.asarray(lat_udeg, np.int64) + 90_000_000
    lon = np.asarray(lon_udeg, np.int64) + 180_000_000
    # clamp the closed upper edge into the last cell
    lonq = np.minimum((lon.astype(object) << lon_bits) // 360_000_000,
                      (1 << lon_bits) - 1).astype(np.int64) \
        if lon_bits > 33 else \
        np.minimum((lon << lon_bits) // 360_000_000,
                   (1 << lon_bits) - 1)
    latq = np.minimum((lat << lat_bits) // 180_000_000,
                      (1 << lat_bits) - 1)
    # interleave: lon on the higher of each bit pair. When bits is
    # odd, lon has one extra (most significant) bit.
    le, lo = np.uint64(lonq), np.uint64(latq)
    if lon_bits == lat_bits:
        code = (_spread(le) << np.uint64(1)) | _spread(lo)
    else:  # odd total: lon's extra MSB peels off to the top, and the
        # remaining lon bits land on the EVEN positions (parity flips
        # relative to the even-total case)
        top = le >> np.uint64(lat_bits)
        rest = le & np.uint64((1 << lat_bits) - 1)
        code = (top << np.uint64(2 * lat_bits)) \
            | (_spread(lo) << np.uint64(1)) | _spread(rest)
    # base-32 chars, 5 bits each from the MSB
    chars = np.empty((precision, len(code)), dtype="U1")
    lut = np.array(list(BASE32))
    for c in range(precision):
        sh = np.uint64(5 * (precision - 1 - c))
        chars[c] = lut[((code >> sh) & np.uint64(31)).astype(np.int64)]
    strs = np.array(["".join(col) for col in chars.T], dtype=object)
    return code, strs
