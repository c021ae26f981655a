"""BMP codec — from the published Windows bitmap format (public
knowledge). Screenshots and legacy exports ship as BMP constantly;
the engine ingests the three layouts that cover real corpora:
24-bit BI_RGB (bottom-up BGR rows, 4-byte row padding), 8-bit
palettized BI_RGB, and 8-bit BI_RLE8 (the run-length layout with
escape codes: 0,0 end-of-line / 0,1 end-of-bitmap / 0,2 delta /
0,3..255 absolute runs with word alignment).
"""

from __future__ import annotations

import struct

import numpy as np

BI_RGB = 0
BI_RLE8 = 1


def encode_bmp(img: np.ndarray, *, palette: "np.ndarray | None" = None,
               rle: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BMP; or (h, w) indices + (n, 3)
    ``palette`` → 8-bit BMP (optionally RLE8-compressed)."""
    if palette is None:
        img = np.ascontiguousarray(img, np.uint8)
        h, w, c = img.shape
        assert c == 3
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, -1)  # bottom-up BGR
        data = rows.tobytes()
        off = 14 + 40
        hdr = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
               + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, BI_RGB,
                             len(data), 2835, 2835, 0, 0))
        return hdr + data
    idx = np.ascontiguousarray(img, np.uint8)
    h, w = idx.shape
    pal = np.zeros((256, 4), np.uint8)
    pal[:len(palette), :3] = np.asarray(palette, np.uint8)[:, ::-1]  # BGRA
    if not rle:
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w] = idx[::-1]
        data = rows.tobytes()
        comp = BI_RGB
    else:
        out = bytearray()
        for r in range(h - 1, -1, -1):  # bottom-up
            row = idx[r]
            x = 0
            while x < w:
                run = 1
                while x + run < w and row[x + run] == row[x] and run < 255:
                    run += 1
                if run >= 2 or w - x == run:
                    out += bytes([run, int(row[x])])
                    x += run
                else:
                    # absolute mode needs >= 3 pixels; emit length-1
                    # encoded runs otherwise
                    lit = x
                    while (lit < w and lit - x < 255
                           and (lit + 1 >= w or lit + 2 >= w
                                or not (row[lit] == row[lit + 1]
                                        == row[lit + 2]))):
                        lit += 1
                    n = lit - x
                    if n >= 3:
                        out += bytes([0, n]) + row[x:lit].tobytes()
                        if n & 1:
                            out.append(0)  # word alignment
                        x = lit
                    else:
                        out += bytes([1, int(row[x])])
                        x += 1
            out += b"\x00\x00"  # end of line
        out += b"\x00\x01"  # end of bitmap
        data = bytes(out)
        comp = BI_RLE8
    off = 14 + 40 + 256 * 4
    hdr = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, comp,
                         len(data), 2835, 2835, 256, 0))
    return hdr + pal.tobytes() + data


def decode_bmp(buf: bytes) -> np.ndarray:
    """Any supported BMP → (h, w, 3) uint8 RGB."""
    buf = bytes(buf)
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", buf, 10)
    hsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", buf, 14)
    flip = h > 0
    h = abs(h)
    if bpp == 24 and comp == BI_RGB:
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(buf, np.uint8, h * stride, off) \
            .reshape(h, stride)
        img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]
        return np.ascontiguousarray(img[::-1] if flip else img)
    if bpp != 8:
        raise ValueError(f"unsupported BMP bpp {bpp}")
    npal = struct.unpack_from("<I", buf, 14 + 32)[0] or 256
    pal = np.frombuffer(buf, np.uint8, npal * 4,
                        14 + hsz).reshape(-1, 4)[:, :3][:, ::-1]
    if comp == BI_RGB:
        stride = (w + 3) & ~3
        rows = np.frombuffer(buf, np.uint8, h * stride, off) \
            .reshape(h, stride)[:, :w]
        idx = rows[::-1] if flip else rows
        return np.ascontiguousarray(pal[idx])
    if comp != BI_RLE8:
        raise ValueError(f"unsupported BMP compression {comp}")
    idx = np.zeros((h, w), np.uint8)
    x, y, pos = 0, 0, off
    n = len(buf)
    while pos + 1 < n:
        b0, b1 = buf[pos], buf[pos + 1]
        pos += 2
        if b0 > 0:  # encoded run
            idx[y, x:x + b0] = b1
            x += b0
        elif b1 == 0:  # end of line
            x, y = 0, y + 1
        elif b1 == 1:  # end of bitmap
            break
        elif b1 == 2:  # delta
            x += buf[pos]
            y += buf[pos + 1]
            pos += 2
        else:  # absolute
            idx[y, x:x + b1] = np.frombuffer(buf, np.uint8, b1, pos)
            pos += b1 + (b1 & 1)
            x += b1
    out = pal[idx[::-1] if flip else idx]
    return np.ascontiguousarray(out)
