"""From-spec PNG codec (ISO/IEC 15948 — the W3C PNG spec; public
knowledge). Real-world corpora are full of PNGs the engine's original
RGB8-only branch quarantined: grayscale screenshots, palette
(color-type 3) web graphics, RGBA cutouts, 16-bit scientific exports,
and Adam7-interlaced files. This module decodes ALL of those and
encodes 8-bit gray/RGB/RGBA/palette with per-row adaptive filtering.

Decode surface: bit depths 1/2/4/8/16; color types 0 (gray), 2 (RGB),
3 (palette+optional tRNS alpha), 4 (gray+alpha), 6 (RGBA); Adam7
interlace; multi-IDAT streams; optional per-chunk CRC verification.

Performance notes (the map_batches hot path):
- filters are BYTE-wise (spec §9.2), so unfiltering is depth-agnostic;
- Sub is an exact modular prefix sum — ``np.add.accumulate(dtype=u8)``
  wraps mod 256, so a Sub row is ONE vector op, not a pixel loop;
- Up rows are one wrapping vector add against the previous
  reconstructed row;
- only Average/Paeth rows pay a left-sequential loop (vectorized over
  the pixel group per step); the engine's own encoder never emits
  them, so engine payloads stay fully vectorized while foreign files
  remain correct.

Reference parity: the reference ingests arbitrary raster/vector trees
via GDAL-backed readers (load.py:37-45 glob of gpkg/csv/tif); PNG here
plays the web-corpus role demanded by the BASELINE.json input_hint
(bytes → pixels, lossless).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 pass origins/strides: (x0, y0, dx, dy) per spec §8.2
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# ---------------------------------------------------------------------------
# unfilter


def _unfilter(data: memoryview, h: int, stride: int, bpp: int,
              off: int) -> "tuple[np.ndarray, int]":
    """Reconstruct h scanlines of `stride` bytes each from the filtered
    stream starting at byte `off`; returns (h, stride) u8 + new offset."""
    need = h * (stride + 1)
    arr = np.frombuffer(data, dtype=np.uint8,
                        count=need, offset=off).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    raw = arr[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        f = int(ftypes[r])
        cur = raw[r]
        prev = out[r - 1] if r else zero
        if f == 0:
            out[r] = cur
        elif f == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp]  (mod 256)
            # modular prefix sum over bpp-strided lanes — one vector op
            out[r] = np.add.accumulate(
                cur.reshape(-1, bpp), axis=0, dtype=np.uint8).reshape(-1)
        elif f == 2:  # Up
            out[r] = cur + prev  # uint8 wraps
        elif f == 3:  # Average — left-sequential
            line = out[r]
            up = prev.astype(np.uint16)
            left = np.zeros(bpp, dtype=np.uint16)
            for x in range(0, stride, bpp):
                rec = (cur[x:x + bpp] + ((left + up[x:x + bpp]) >> 1)) & 0xFF
                line[x:x + bpp] = rec
                left = rec.astype(np.uint16)
        elif f == 4:  # Paeth — left-sequential
            line = out[r]
            up = prev.astype(np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            ul = np.zeros(bpp, dtype=np.int16)
            for x in range(0, stride, bpp):
                u = up[x:x + bpp]
                p = left + u - ul
                pa_, pb, pc_ = np.abs(p - left), np.abs(p - u), np.abs(p - ul)
                pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                                np.where(pb <= pc_, u, ul))
                rec = (cur[x:x + bpp] + pred) & 0xFF
                line[x:x + bpp] = rec
                left = rec.astype(np.int16)
                ul = u
            out[r] = line & 0xFF
        else:
            raise ValueError(f"PNG filter type {f} invalid")
    return out, off + need


def _expand_bits(rows: np.ndarray, w: int, channels: int,
                 depth: int) -> np.ndarray:
    """(h, stride) packed bytes → (h, w*channels) samples (values kept
    at their native scale)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * channels]
    if depth == 16:
        return rows.reshape(h, -1).view(">u2")[:, : w * channels]
    # depth < 8: samples pack MSB-first within each byte (spec §7.2),
    # so every consecutive `depth`-bit group of the unpacked bitstream
    # is one sample in order
    vals = np.unpackbits(rows, axis=1).reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    samples = (vals * weights).sum(axis=2, dtype=np.uint16)
    return samples[:, : w * channels]


# ---------------------------------------------------------------------------
# decode


def decode(buf: bytes, *, verify_crc: bool = False):
    """Full decode → (array, info). Array is (h, w) or (h, w, c) in the
    stream's native sample scale (u8, or u16 for depth 16; sub-byte
    depths are returned as u16 sample values). Palette streams return
    the RGB(A)-expanded array. info: dict(w, h, depth, color_type,
    channels, interlace, n_idat)."""
    if bytes(buf[:8]) != SIG:
        raise ValueError("bad PNG signature")
    pos, n = 8, len(buf)
    w = h = depth = ctype = interlace = 0
    plte = None
    trns = None
    idat = []
    while pos + 8 <= n:
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = bytes(buf[pos + 4:pos + 8])
        body = buf[pos + 8:pos + 8 + ln]
        if verify_crc:
            (crc,) = struct.unpack_from(">I", buf, pos + 8 + ln)
            if zlib.crc32(bytes(buf[pos + 4:pos + 8 + ln])) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = \
                struct.unpack_from(">IIBBBBB", body)
            if comp != 0 or filt != 0:
                raise ValueError("unsupported compression/filter method")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            allowed = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                       4: (8, 16), 6: (8, 16)}[ctype]
            if depth not in allowed:
                raise ValueError(f"bit depth {depth} invalid for color"
                                 f" type {ctype}")
        elif tag == b"PLTE":
            plte = np.frombuffer(bytes(body), np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(bytes(body), np.uint8)
        elif tag == b"IDAT":
            idat.append(bytes(body))
        elif tag == b"IEND":
            break
    if not w or not h:
        raise ValueError("missing IHDR")
    channels = _CHANNELS[ctype]
    bpp = max(1, channels * depth // 8)
    data = memoryview(zlib.decompress(b"".join(idat)))

    def stride_of(width: int) -> int:
        return (width * channels * depth + 7) // 8

    if interlace == 0:
        rows, _ = _unfilter(data, h, stride_of(w), bpp, 0)
        samples = _expand_bits(rows, w, channels, depth)
    elif interlace == 1:
        sdtype = np.uint16 if depth >= 9 or depth < 8 else np.uint8
        samples = np.zeros((h, w * channels), dtype=sdtype)
        img = samples.reshape(h, w, channels)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, off = _unfilter(data, ph, stride_of(pw), bpp, off)
            sub = _expand_bits(rows, pw, channels, depth)
            img[y0::dy, x0::dx, :] = sub.reshape(ph, pw, channels)
    else:
        raise ValueError(f"unknown interlace method {interlace}")

    info = {"w": w, "h": h, "depth": depth, "color_type": ctype,
            "channels": channels, "interlace": interlace,
            "n_idat": len(idat)}
    if ctype == 3:
        if plte is None:
            raise ValueError("palette stream without PLTE")
        idx = samples.reshape(h, w).astype(np.int64)
        if idx.size and int(idx.max()) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = trns
            out = np.concatenate([rgb, alpha[idx][..., None]], axis=2)
            info["channels"] = 4
            return out, info
        info["channels"] = 3
        return rgb, info
    out = samples.reshape(h, w, channels) if channels > 1 \
        else samples.reshape(h, w)
    return out, info


def decode_rgb(buf: bytes) -> np.ndarray:
    """Decode any supported PNG to the engine's H×W×3 uint8 contract:
    palette expanded, alpha dropped, gray replicated, 16-bit taken at
    the most-significant byte, sub-byte gray scaled to full range."""
    arr, info = decode(buf)
    depth = info["depth"]
    if info["color_type"] == 3:
        rgb = arr[..., :3]
        return np.ascontiguousarray(rgb)
    if depth == 16:
        arr = (arr >> 8).astype(np.uint8)
    elif depth < 8:
        # scale 0..(2^d - 1) to 0..255 exactly (spec sample scaling)
        arr = (arr * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if arr.ndim == 2:
        return np.repeat(arr[:, :, None], 3, axis=2)
    c = arr.shape[2]
    if c == 2:  # gray+alpha
        return np.repeat(arr[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(arr[:, :, :3])


# ---------------------------------------------------------------------------
# encode


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _filter_rows(img2d: np.ndarray, bpp: int) -> bytes:
    """Adaptive per-row filter among None/Sub/Up — all three candidate
    row sets and their costs computed in whole-image vector ops (the
    libpng minimum-sum-of-absolute-differences heuristic); Average and
    Paeth are intentionally never emitted so decode stays loop-free."""
    h, stride = img2d.shape
    f0 = img2d
    left = np.zeros_like(img2d)
    left[:, bpp:] = img2d[:, :-bpp]
    f1 = img2d - left
    up = np.zeros_like(img2d)
    up[1:] = img2d[:-1]
    f2 = img2d - up

    def cost(f: np.ndarray) -> np.ndarray:
        v = f.astype(np.int16)
        return np.minimum(v, 256 - v).sum(axis=1)

    choice = np.argmin(np.stack([cost(f0), cost(f1), cost(f2)]), axis=0)
    out = np.empty((h, stride + 1), dtype=np.uint8)
    out[:, 0] = choice
    rows = np.where(choice[:, None] == 0, f0,
                    np.where(choice[:, None] == 1, f1, f2))
    out[:, 1:] = rows
    return out.tobytes()


def encode(img: np.ndarray, *, palette: "np.ndarray | None" = None,
           interlace: bool = False, level: int = 6) -> bytes:
    """Encode 8-bit images: (h, w) gray, (h, w, 3) RGB, (h, w, 4) RGBA,
    or palette mode ((h, w) indices + a (n, 3) ``palette``). Per-row
    adaptive None/Sub/Up filters; optional Adam7 interlace."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if palette is not None:
        if img.ndim != 2:
            raise ValueError("palette mode takes (h, w) index array")
        if len(palette) > 256 or int(img.max(initial=0)) >= len(palette):
            raise ValueError("palette must cover all indices (≤256)")
        ctype, channels = 3, 1
    elif img.ndim == 2:
        ctype, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        ctype, channels = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        ctype, channels = 6, 4
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    flat = img.reshape(h, w * channels)
    bpp = channels
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            parts.append(_filter_rows(
                sub.reshape(sub.shape[0], -1), bpp))
        raw = b"".join(parts)
    else:
        raw = _filter_rows(flat, bpp)
    out = [SIG, _chunk(b"IHDR", struct.pack(
        ">IIBBBBB", w, h, 8, ctype, 0, 0, 1 if interlace else 0))]
    if palette is not None:
        out.append(_chunk(b"PLTE", np.ascontiguousarray(
            palette, dtype=np.uint8).tobytes()))
    out.append(_chunk(b"IDAT", zlib.compress(raw, level)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)
