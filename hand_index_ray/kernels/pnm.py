"""Binary PNM (Netpbm P5/P6) — from the public spec.

The simplest real raster interchange family: ASCII header
(magic, whitespace, width, height, maxval) followed by raw samples —
P5 is single-channel, P6 is RGB. Maxval ≤ 255 keeps samples one byte.
Comments (# …) are legal anywhere in the header whitespace and are
handled. Everything is exact bytes, so PNM payloads are
SQL-oracle-transparent like the raw codec while exercising a real
header parser.
"""

from __future__ import annotations

import numpy as np


def encode_pnm(img: np.ndarray) -> bytes:
    """H×W (P5) or H×W×3 (P6) uint8 → binary PNM bytes."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim == 2:
        magic = b"P5"
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"unsupported shape {a.shape}")
    h, w = a.shape[0], a.shape[1]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_pnm(buf: bytes) -> np.ndarray:
    """Binary PNM bytes → uint8 array (H×W or H×W×3)."""
    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM")
    chans = 3 if buf[:2] == b"P6" else 1
    # header: three decimal tokens after the magic, whitespace- and
    # comment-separated; a single whitespace byte ends the header
    pos, vals = 2, []
    while len(vals) < 3:
        while buf[pos] in b" \t\r\n":
            pos += 1
        if buf[pos] == ord("#"):
            while buf[pos] != ord("\n"):
                pos += 1
            continue
        start = pos
        while buf[pos] not in b" \t\r\n":
            pos += 1
        vals.append(int(buf[start:pos]))
    pos += 1  # exactly one whitespace byte before the raster
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    a = np.frombuffer(buf, dtype=np.uint8, count=w * h * chans, offset=pos)
    return a.reshape(h, w) if chans == 1 else a.reshape(h, w, 3)
