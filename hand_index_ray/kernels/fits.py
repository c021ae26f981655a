"""FITS (Flexible Image Transport System) — from the public standard.

The astronomy archive format: 2880-byte header blocks of 80-character
ASCII "card images" (KEYWORD= value / comment), terminated by an END
card and padded to the block boundary, followed by big-endian data
padded to 2880 bytes. This reader/writer covers the primary HDU with
BITPIX 16 (the classic CCD integer frame), NAXIS 2, and the optional
BZERO offset convention (unsigned 16-bit data is stored as signed +
BZERO 32768 — handled exactly in integers).
"""

from __future__ import annotations

import numpy as np

BLOCK = 2880


def _card(key: str, value) -> bytes:
    if isinstance(value, bool):
        v = "T" if value else "F"
        body = f"{key:<8}= {v:>20}"
    elif isinstance(value, (int, np.integer)):
        body = f"{key:<8}= {int(value):>20}"
    else:
        body = f"{key:<8}= '{value}'"
    return body.ljust(80).encode("ascii")


def encode_fits(img: np.ndarray, bzero: int = 0) -> bytes:
    """H×W integer image → primary-HDU FITS bytes (BITPIX 16)."""
    a = np.asarray(img)
    assert a.ndim == 2, a.shape
    stored = (a.astype(np.int64) - bzero)
    assert stored.min() >= -32768 and stored.max() <= 32767, "16-bit range"
    cards = [_card("SIMPLE", True), _card("BITPIX", 16),
             _card("NAXIS", 2), _card("NAXIS1", a.shape[1]),
             _card("NAXIS2", a.shape[0])]
    if bzero:
        cards.append(_card("BZERO", bzero))
        cards.append(_card("BSCALE", 1))
    cards.append(b"END".ljust(80))
    head = b"".join(cards)
    head += b" " * (-len(head) % BLOCK)
    data = stored.astype(">i2").tobytes()
    data += b"\x00" * (-len(data) % BLOCK)
    return head + data


def decode_fits(buf: bytes) -> np.ndarray:
    """Primary-HDU FITS bytes → int64 H×W image (BZERO applied)."""
    hdr: dict = {}
    pos = 0
    done = False
    while not done:
        block = buf[pos:pos + BLOCK]
        if len(block) < BLOCK:
            raise ValueError("truncated header")
        for i in range(0, BLOCK, 80):
            card = block[i:i + 80].decode("ascii", "replace")
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if card[8:10] == "= ":
                val = card[10:].split("/")[0].strip()
                hdr[key] = val
        pos += BLOCK
    if hdr.get("SIMPLE") != "T":
        raise ValueError("not a simple FITS")
    if int(hdr["BITPIX"]) != 16 or int(hdr["NAXIS"]) != 2:
        raise ValueError("only BITPIX 16 / NAXIS 2 supported")
    w, h = int(hdr["NAXIS1"]), int(hdr["NAXIS2"])
    bzero = int(hdr.get("BZERO", "0"))
    a = np.frombuffer(buf, dtype=">i2", count=w * h, offset=pos)
    return a.reshape(h, w).astype(np.int64) + bzero
