"""GIF codec — from the published GIF89a specification (public
knowledge; CompuServe 1990). The third ubiquitous web image container
(after JPEG/PNG): palette frames, LZW with LSB-first variable-width
codes in 255-byte sub-blocks, optional animation via multiple image
descriptors + graphic control extensions.

Decoder surface: GIF87a/89a headers, global + local color tables,
interlaced frames (the GIF 4-pass scheme, distinct from PNG Adam7),
frame offsets with disposal methods 1 (keep) and 2 (restore
background), transparency index compositing, full LZW (code growth to
12 bits, CLEAR resets, deferred-clear tolerance). Encoder: real
dictionary LZW (not the uncompressed-GIF trick), per-frame local
palettes, animation with delays.

The LZW symbol loop is per-code Python — the dictionary is data-
dependent, exactly like TIFF LZW (kernels/geotiff.py); parallelism
comes from frames/images inside map_batches, not from within a
stream.
"""

from __future__ import annotations

import struct

import numpy as np

# GIF interlace passes: (start_row, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (LSB-first bit packing — the opposite of TIFF's MSB-first)


def _lzw_encode_gif(data: bytes, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    free = eoi + 1
    put(clear, width)
    w = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        put(table[w], width)
        table[wc] = free
        free += 1
        if free > (1 << width) and width < 12:
            width += 1
        elif free > (1 << 12):
            put(clear, width)
            table = {bytes([j]): j for j in range(clear)}
            free = eoi + 1
            width = min_code + 1
        w = c
    if w:
        put(table[w], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = nbits = pos = 0
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev = b""
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # tolerate missing EOI
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = b""
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


# ---------------------------------------------------------------------------
# container


def _color_table(rgb: np.ndarray) -> "tuple[bytes, int]":
    """Pad a (n, 3) palette to a power-of-two size ≥ 2; return
    (raw bytes, size_exponent - 1 field value)."""
    n = len(rgb)
    size = 2
    exp = 0
    while size < max(n, 2):
        size <<= 1
        exp += 1
    pad = np.zeros((size, 3), np.uint8)
    pad[:n] = rgb
    return pad.tobytes(), exp


def encode_gif(frames, palettes, *, delays=None, transparent=None,
               loop: bool = True) -> bytes:
    """frames: list of (h, w) uint8 index arrays (all same size);
    palettes: one (n, 3) palette per frame (local color tables);
    delays: centiseconds per frame (animation when > 1 frame)."""
    if not isinstance(frames, (list, tuple)):
        frames = [frames]
        palettes = [palettes]
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x00, 0, 0)  # no global table
    if len(frames) > 1 and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fi, (idx, pal) in enumerate(zip(frames, palettes)):
        if delays is not None or transparent is not None:
            flags = 0x04  # disposal 1 (keep)
            t = 0
            if transparent is not None and transparent[fi] is not None:
                flags |= 0x01
                t = int(transparent[fi])
            out += b"\x21\xf9\x04" + bytes([flags]) \
                + struct.pack("<H", 0 if delays is None
                              else int(delays[fi])) + bytes([t, 0])
        raw, exp = _color_table(np.asarray(pal, np.uint8))
        fh, fw = idx.shape
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, fw, fh) \
            + bytes([0x80 | exp])
        out += raw
        min_code = max(2, exp + 1)
        out.append(min_code)
        comp = _lzw_encode_gif(
            np.ascontiguousarray(idx, np.uint8).tobytes(), min_code)
        for s in range(0, len(comp), 255):
            chunk = comp[s:s + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(buf: bytes):
    """Decode all frames → (list of (h, w, 3) uint8 composited RGB
    frames, info dict). Handles GCT/LCT, interlace, frame offsets,
    disposal 1/2, transparency."""
    buf = bytes(buf)
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None:
        canvas[:] = gct[bg]
    frames = []
    delays = []
    transparent = None
    disposal = 0
    delay = 0
    n_ext = 0
    while pos < len(buf):
        b0 = buf[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = buf[pos]
            pos += 1
            n_ext += 1
            if label == 0xF9:
                size = buf[pos]
                gflags = buf[pos + 1]
                delay = struct.unpack_from("<H", buf, pos + 2)[0]
                tidx = buf[pos + 4]
                transparent = tidx if gflags & 0x01 else None
                disposal = (gflags >> 2) & 0x07
                pos += 1 + size
            else:
                while buf[pos]:
                    pos += 1 + buf[pos]
            pos += 1  # block terminator
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        fx, fy, fw, fh = struct.unpack_from("<HHHH", buf, pos)
        lflags = buf[pos + 8]
        pos += 9
        pal = gct
        if lflags & 0x80:
            n = 2 << (lflags & 0x07)
            pal = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("frame without any color table")
        min_code = buf[pos]
        pos += 1
        comp = bytearray()
        while buf[pos]:
            ln = buf[pos]
            comp += buf[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(_lzw_decode_gif(bytes(comp), min_code),
                            np.uint8, fw * fh).reshape(fh, fw)
        if lflags & 0x40:  # interlaced: reorder rows
            deinter = np.empty_like(idx)
            r = 0
            for start, step in _INTERLACE:
                rows = range(start, fh, step)
                for rr in rows:
                    deinter[rr] = idx[r]
                    r += 1
            idx = deinter
        prev = canvas.copy()
        region = canvas[fy:fy + fh, fx:fx + fw]
        rgb = pal[np.minimum(idx, len(pal) - 1)]
        if transparent is not None:
            m = idx != transparent
            region[m] = rgb[m]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore background
            canvas[fy:fy + fh, fx:fx + fw] = \
                gct[bg] if gct is not None else 0
        elif disposal == 3:
            canvas[:] = prev
        transparent = None
        disposal = 0
        delay = 0
    return frames, {"w": w, "h": h, "n_frames": len(frames),
                    "delays": delays, "n_ext": n_ext}
