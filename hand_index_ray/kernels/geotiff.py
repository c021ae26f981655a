"""GeoTIFF raster codec — pure numpy/stdlib, from the public TIFF 6.0
and OGC GeoTIFF 1.1 specs.

The reference's HAND index stores *paths* to ``.tif`` rasters
(``load.py:44-45`` globs ``*gw_catchments_reaches*.tif`` /
``*rem_zeroed*.tif``) and never decodes them — decoding happens in GDAL
downstream. This engine decodes payloads for real inside
``map_batches`` stages, so the raster analog needs a real GeoTIFF
codec, not a pointer table:

- ``encode_geotiff(arr, ...)``: single-band classic TIFF (strip or
  tiled layout) with Deflate (8), LZW (5, MSB-first early-change
  variant), PackBits (32773) or no compression, horizontal predictor
  (2) for integer samples and the TechNote-3 floating-point predictor
  (3) for float samples, plus the GeoTIFF georeferencing tags
  (ModelPixelScale 33550, ModelTiepoint 33922, GeoKeyDirectory 34735,
  GDAL_NODATA 42113).
- ``parse_info(src)``: IFD-only metadata (dims, dtype, compression,
  layout, CRS, nodata, geo bbox) — **no pixel decode, no full read**;
  this is the raster-catalog stage's kernel: a few hundred header
  bytes per file regardless of raster size.
- ``decode_geotiff(buf)``: full decode to a 2-D numpy array.
- ``decode_window(src, x0, y0, w, h)``: COG-style partial decode —
  reads ONLY the byte ranges of strips/tiles intersecting the pixel
  window (``src`` may be bytes or a seekable file handle, e.g.
  ``pyarrow.fs`` ``open_input_file``). This is the 100 TB shape: an
  ROI query over a raster catalog touches header + intersecting tiles,
  never whole files. ``_Reader.bytes_read`` makes read amplification
  testable.

Spec notes baked into tests (tests/test_geotiff.py):
- PackBits is pinned to the TIFF-6 spec's published worked example.
- LZW bit order is MSB-first; the *early-change* code-width bump
  (width grows when the table reaches ``(1 << width) - 1`` entries —
  one code earlier than plain LZW) is applied symmetrically in the
  encoder and decoder from a shared adds-counter, the same boundary
  libtiff uses; exercised by incompressible segments that force 9→12
  bit growth and a table-full CLEAR.
- Predictor 2 resets per row (vectorized cumsum with wraparound);
  predictor 3 splits each row into big-endian byte planes before
  differencing (TIFF TechNote 3), independent of file byte order.
- Tile dimensions are multiples of 16; edge tiles are zero-padded in
  the file and cropped on decode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# dtype.kind -> TIFF SampleFormat
_SFMT = {"u": 1, "i": 2, "f": 3}
_SFMT_INV = {1: "u", 2: "i", 3: "f"}

_COMP = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}
_COMP_INV = {1: "none", 5: "lzw", 8: "deflate", 32946: "deflate",
             32773: "packbits"}

# TIFF field types: id -> (struct char, size)
_FT = {1: ("B", 1), 2: ("c", 1), 3: ("H", 2), 4: ("I", 4),
       5: ("II", 8), 12: ("d", 8), 16: ("Q", 8), 17: ("q", 8)}

_T_SUBFILE = 254  # NewSubfileType; 1 = reduced-resolution (overview)
_T_PLANAR = 284   # PlanarConfiguration; 1 = chunky (interleaved)
_T_WIDTH, _T_HEIGHT = 256, 257
_T_BITS, _T_COMP, _T_PHOTO = 258, 259, 262
_T_STRIP_OFF, _T_SPP, _T_RPS, _T_STRIP_CNT = 273, 277, 278, 279
_T_PRED = 317
_T_TILE_W, _T_TILE_H, _T_TILE_OFF, _T_TILE_CNT = 322, 323, 324, 325
_T_SFMT = 339
_T_PIX_SCALE, _T_TIEPOINT = 33550, 33922
_T_GEO_KEYS, _T_GEO_DOUBLES, _T_GEO_ASCII = 34735, 34736, 34737
_T_GDAL_NODATA = 42113

_GK_MODEL_TYPE, _GK_RASTER_TYPE = 1024, 1025
_GK_GEOGRAPHIC_CS, _GK_PROJECTED_CS = 2048, 3072

_CLEAR, _EOI = 256, 257


# ---------------------------------------------------------------------------
# LZW (TIFF variant: MSB-first bit packing, early-change width bumps)


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.nbits = 0
        return bytes(self.buf)


def _lzw_encode(data: bytes) -> bytes:
    bw = _BitWriter()
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    free_ent, width = 258, 9
    bw.put(_CLEAR, width)
    w = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        bw.put(table[w], width)
        table[wc] = free_ent
        free_ent += 1
        # early change: bump one entry before the plain-LZW boundary
        if free_ent == (1 << width) - 1 and width < 12:
            width += 1
        if free_ent == 4093:  # table nearly full: reset (libtiff boundary)
            bw.put(_CLEAR, width)
            table = {bytes([j]): j for j in range(256)}
            free_ent, width = 258, 9
        w = c
    if w:
        bw.put(table[w], width)
        # mirror the decoder's shared adds-counter so EOI width agrees
        free_ent += 1
        if free_ent == (1 << width) - 1 and width < 12:
            width += 1
    bw.put(_EOI, width)
    return bw.flush()


def _lzw_decode(data: bytes, expected: int | None = None) -> bytes:
    """TIFF LZW decode. Per-code Python loop (the honest serial part —
    the table is data-dependent so codes can't be lifted to numpy the
    way Rice residuals can in kernels/flac.py); parallelism comes from
    segments: every strip/tile decodes independently inside
    map_batches."""
    out = bytearray()
    pos, acc, nbits = 0, 0, 0
    width = 9
    table: list[bytes] = []
    prev = b""
    enc_free = 258
    n = len(data)
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    while True:
        while nbits < width:
            if pos >= n:
                if expected is not None and len(out) < expected:
                    raise ValueError("short LZW segment")
                return bytes(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        if code == _EOI:
            break
        if code == _CLEAR:
            table = list(base)
            width, enc_free, prev = 9, 258, b""
            continue
        if not table:
            raise ValueError("LZW stream does not start with CLEAR")
        if prev == b"":  # first code after CLEAR: no table add
            if code >= 256:
                raise ValueError("bad initial LZW code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
            else:
                raise ValueError("LZW code out of range")
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        # shared adds-counter: encoder adds one entry per emitted code
        enc_free += 1
        if enc_free == (1 << width) - 1 and width < 12:
            width += 1
    if expected is not None and len(out) < expected:
        raise ValueError("short LZW segment")
    return bytes(out)


# ---------------------------------------------------------------------------
# PackBits


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3 or (j - i == 2 and j == n):
            out.append((257 - (j - i)) & 0xFF)  # -(run-1) as signed byte
            out.append(data[i])
            i = j
        else:
            # literal run until next >=3 repeat or 128 cap
            k = i
            while k < n and k - i < 128:
                if k + 2 < n and data[k] == data[k + 1] == data[k + 2]:
                    break
                k += 1
            out.append(k - i - 1)
            out += data[i:k]
            i = k
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        ctl = data[i]
        i += 1
        if ctl < 128:  # literal: next ctl+1 bytes
            out += data[i:i + ctl + 1]
            i += ctl + 1
        elif ctl > 128:  # repeat next byte 257-ctl times
            out += data[i:i + 1] * (257 - ctl)
            i += 1
        # ctl == 128: no-op
    return bytes(out)


# ---------------------------------------------------------------------------
# predictors (both reset per row — vectorized over the whole segment)


def _hdiff_encode(seg: np.ndarray) -> np.ndarray:
    u = seg.view(np.dtype(f"u{seg.dtype.itemsize}"))
    d = u.copy()
    d[:, 1:] = u[:, 1:] - u[:, :-1]  # unsigned wraparound == mod 2^bits
    return d.view(seg.dtype)


def _hdiff_decode(seg: np.ndarray) -> np.ndarray:
    u = seg.view(np.dtype(f"u{seg.dtype.itemsize}"))
    bits = seg.dtype.itemsize * 8
    acc = np.cumsum(u.astype(np.uint64), axis=1)
    if bits < 64:
        acc &= np.uint64((1 << bits) - 1)
    return acc.astype(u.dtype).view(seg.dtype)


def _fpdiff_encode(seg: np.ndarray) -> bytes:
    rows, cols = seg.shape
    it = seg.dtype.itemsize
    be = np.ascontiguousarray(seg.astype(f">f{it}")).view(np.uint8)
    planes = be.reshape(rows, cols, it).transpose(0, 2, 1).reshape(rows, cols * it)
    d = planes.copy()
    d[:, 1:] = planes[:, 1:] - planes[:, :-1]
    return d.tobytes()


def _fpdiff_decode(raw: bytes, rows: int, cols: int, itemsize: int) -> np.ndarray:
    d = np.frombuffer(raw, np.uint8).reshape(rows, cols * itemsize)
    acc = (np.cumsum(d.astype(np.uint32), axis=1) & 0xFF).astype(np.uint8)
    be = acc.reshape(rows, itemsize, cols).transpose(0, 2, 1)
    return np.ascontiguousarray(be).view(f">f{itemsize}").reshape(rows, cols)


# ---------------------------------------------------------------------------
# segment codec


def _encode_segment(seg: np.ndarray, comp: str, predictor: int) -> bytes:
    if predictor == 2:
        raw = _hdiff_encode(seg).astype(seg.dtype.newbyteorder("<")).tobytes()
    elif predictor == 3:
        raw = _fpdiff_encode(seg)
    else:
        raw = np.ascontiguousarray(seg.astype(seg.dtype.newbyteorder("<"))).tobytes()
    if comp == "none":
        return raw
    if comp == "deflate":
        return zlib.compress(raw, 6)
    if comp == "lzw":
        return _lzw_encode(raw)
    if comp == "packbits":
        return _packbits_encode(raw)
    raise ValueError(f"compression {comp!r}")


def _decode_segment(buf: bytes, rows: int, cols: int, dtype: np.dtype,
                    comp: str, predictor: int, byte_order: str,
                    nb: int = 1) -> np.ndarray:
    """Decode one strip/tile to (rows, cols) or (rows, cols, nb) for
    chunky multi-band. The horizontal predictor differences each
    sample against the SAME channel of the previous pixel, which the
    (rows, cols, nb) reshape makes a plain axis-1 cumsum."""
    expected = rows * cols * nb * dtype.itemsize
    if comp == "none":
        raw = buf[:expected]
    elif comp == "deflate":
        raw = zlib.decompress(buf)
    elif comp == "lzw":
        raw = _lzw_decode(buf, expected)
    elif comp == "packbits":
        raw = _packbits_decode(buf, expected)
    else:
        raise ValueError(f"compression {comp!r}")
    if len(raw) < expected:
        raise ValueError("short segment data")
    if predictor == 3:
        if nb != 1:
            raise ValueError("float predictor is single-band here")
        return _fpdiff_decode(raw[:expected], rows, cols,
                              dtype.itemsize).astype(dtype)
    shape = (rows, cols) if nb == 1 else (rows, cols, nb)
    seg = np.frombuffer(raw[:expected],
                        dtype.newbyteorder(byte_order)).reshape(shape)
    seg = seg.astype(dtype)  # native order, writable copy
    if predictor == 2:
        seg = _hdiff_decode(seg)
    return seg


# ---------------------------------------------------------------------------
# encoder


def _dtype_tags(dt: np.dtype) -> tuple[int, int]:
    if dt.kind not in _SFMT:
        raise ValueError(f"unsupported dtype {dt}")
    return dt.itemsize * 8, _SFMT[dt.kind]


def _halve_floor(a: np.ndarray) -> np.ndarray:
    """One overview level: 2x2 block mean over the EXISTING pixels
    (GDAL 'average' — edge blocks with 1-2 source pixels average only
    those), floored for integer samples. Works per channel for
    (h, w, nb) arrays."""
    h, w = a.shape[:2]
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    acc_t = np.int64 if a.dtype.kind != "f" else np.float64
    pad = np.zeros((h2 * 2, w2 * 2) + a.shape[2:], acc_t)
    pad[:h, :w] = a
    cnt = np.zeros((h2 * 2, w2 * 2), np.int64)
    cnt[:h, :w] = 1
    s = pad[0::2, 0::2] + pad[0::2, 1::2] + pad[1::2, 0::2] + pad[1::2, 1::2]
    c = cnt[0::2, 0::2] + cnt[0::2, 1::2] + cnt[1::2, 0::2] + cnt[1::2, 1::2]
    if a.ndim == 3:
        c = c[..., None]
    return (s // c if a.dtype.kind != "f" else s / c).astype(a.dtype)


def _cut_segments(arr: np.ndarray, compression: str, predictor: int,
                  tile, rows_per_strip):
    """(encoded segments, layout dict) for one IFD level."""
    h, w = arr.shape[:2]
    nb = 1 if arr.ndim == 2 else arr.shape[2]
    dt = arr.dtype
    segs: list[bytes] = []
    if tile is not None:
        tw, th = tile
        if tw % 16 or th % 16:
            raise ValueError("tile dims must be multiples of 16")
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                t = np.zeros((th, tw) + arr.shape[2:], dt)
                part = arr[ty:ty + th, tx:tx + tw]
                t[:part.shape[0], :part.shape[1]] = part
                segs.append(_encode_segment(t, compression, predictor))
        return segs, {"tile": (tw, th)}
    if rows_per_strip is None:
        rows_per_strip = max(1, 8192 // max(1, w * nb * dt.itemsize))
    rows_per_strip = min(rows_per_strip, h)
    for y in range(0, h, rows_per_strip):
        segs.append(_encode_segment(arr[y:y + rows_per_strip],
                                    compression, predictor))
    return segs, {"rps": rows_per_strip}


def encode_geotiff(arr: np.ndarray, *, compression: str = "deflate",
                   predictor: int | None = None,
                   rows_per_strip: int | None = None,
                   tile: tuple[int, int] | None = None,
                   pixel_scale: tuple[float, float] | None = None,
                   tiepoint: tuple[float, float, float, float] | None = None,
                   epsg: int | None = None,
                   nodata: float | None = None,
                   bigtiff: bool = False,
                   overviews: int = 0) -> bytes:
    """Encode an array as a little-endian GeoTIFF.

    - ``arr``: (h, w) single-band or (h, w, nb) chunky multi-band
      (PlanarConfiguration 1, samples interleaved per pixel).
    - ``tiepoint`` is (pixel_i, pixel_j, geo_x, geo_y); ``pixel_scale``
      is (sx, sy) with the usual north-up convention (y decreases with
      row). ``tile=(tw, th)`` selects tiled layout (multiples of 16),
      otherwise strips of ``rows_per_strip`` rows (default ~8 KiB).
    - ``bigtiff=True`` writes BigTIFF (magic 43, 8-byte offsets and
      20-byte IFD entries) — the container real >4 GB HAND rasters
      ship in; the layout is identical otherwise.
    - ``overviews=N`` appends N reduced-resolution IFDs
      (NewSubfileType 1) chained after the full-resolution IFD, each a
      2x2 floor-mean halving of the previous level — the COG overview
      pyramid, same compression/layout settings per level."""
    arr = np.ascontiguousarray(arr)
    if arr.ndim not in (2, 3):
        raise ValueError("(h, w) or (h, w, bands) array required")
    nb = 1 if arr.ndim == 2 else arr.shape[2]
    dt = arr.dtype
    bits, sfmt = _dtype_tags(dt)
    if predictor is None:
        predictor = 1
    if predictor == 2 and dt.kind == "f":
        raise ValueError("predictor 2 is for integer samples")
    if predictor == 3 and (dt.kind != "f" or nb != 1):
        raise ValueError("predictor 3 is for single-band float samples")
    if predictor != 1 and compression in ("none", "packbits"):
        raise ValueError("predictor requires LZW or Deflate")

    levels = [arr]
    for _ in range(overviews):
        levels.append(_halve_floor(levels[-1]))

    out = bytearray()
    if bigtiff:
        out += struct.pack("<2sHHHQ", b"II", 43, 8, 0, 0)
    else:
        out += struct.pack("<2sHI", b"II", 42, 0)

    # --- segments of every level first; IFDs go at the end and the
    # header points at them (parse_info seeks there with ranged reads
    # and never touches pixel bytes)
    per_level = []
    for a in levels:
        segs, geom = _cut_segments(a, compression, predictor,
                                   tile, rows_per_strip)
        offs = []
        for s in segs:
            if len(out) & 1:
                out += b"\x00"
            offs.append(len(out))
            out += s
        per_level.append((a, offs, [len(s) for s in segs], geom))

    inline = 8 if bigtiff else 4
    off_type, off_fmt = (16, "Q") if bigtiff else (4, "I")

    def build_entries(lv, a, offs, lens, geom):
        entries: list[tuple[int, int, int, bytes]] = []

        def tag_short(tag, *vals):
            entries.append((tag, 3, len(vals),
                            struct.pack(f"<{len(vals)}H", *vals)))

        def tag_long(tag, *vals):
            entries.append((tag, 4, len(vals),
                            struct.pack(f"<{len(vals)}I", *vals)))

        def tag_off(tag, *vals):
            entries.append((tag, off_type, len(vals),
                            struct.pack(f"<{len(vals)}{off_fmt}", *vals)))

        def tag_double(tag, *vals):
            entries.append((tag, 12, len(vals),
                            struct.pack(f"<{len(vals)}d", *vals)))

        def tag_ascii(tag, s):
            b = s.encode() + b"\x00"
            entries.append((tag, 2, len(b), b))

        lh, lw = a.shape[:2]
        if lv > 0:
            tag_long(_T_SUBFILE, 1)  # reduced-resolution subfile
        tag_long(_T_WIDTH, lw)
        tag_long(_T_HEIGHT, lh)
        tag_short(_T_BITS, *([bits] * nb))
        tag_short(_T_COMP, _COMP[compression])
        tag_short(_T_PHOTO, 2 if nb == 3 else 1)
        tag_short(_T_SPP, nb)
        if nb > 1:
            tag_short(_T_PLANAR, 1)
        if "tile" in geom:
            tag_short(_T_TILE_W, geom["tile"][0])
            tag_short(_T_TILE_H, geom["tile"][1])
            tag_off(_T_TILE_OFF, *offs)
            tag_long(_T_TILE_CNT, *lens)
        else:
            tag_long(_T_RPS, geom["rps"])
            tag_off(_T_STRIP_OFF, *offs)
            tag_long(_T_STRIP_CNT, *lens)
        if predictor != 1:
            tag_short(_T_PRED, predictor)
        tag_short(_T_SFMT, *([sfmt] * nb))
        if lv == 0:
            if pixel_scale is not None:
                tag_double(_T_PIX_SCALE, pixel_scale[0], pixel_scale[1], 0.0)
            if tiepoint is not None:
                i, j, x, y = tiepoint
                tag_double(_T_TIEPOINT, i, j, 0.0, x, y, 0.0)
            if epsg is not None:
                geographic = epsg == 4326 or 4000 <= epsg < 5000
                keys = [(_GK_MODEL_TYPE, 0, 1, 2 if geographic else 1),
                        (_GK_RASTER_TYPE, 0, 1, 1)]  # PixelIsArea
                keys.append((_GK_GEOGRAPHIC_CS if geographic
                             else _GK_PROJECTED_CS, 0, 1, epsg))
                flat = [1, 1, 1, len(keys)]
                for k in keys:
                    flat.extend(k)
                tag_short(_T_GEO_KEYS, *flat)
            if nodata is not None:
                tag_ascii(_T_GDAL_NODATA, repr(nodata) if dt.kind == "f"
                          else str(int(nodata)))
        entries.sort(key=lambda e: e[0])
        return entries

    # --- external payloads for every IFD, then the IFD blocks chained
    blocks = []
    for lv, (a, offs, lens, geom) in enumerate(per_level):
        fixed = []
        for tag, ft, cnt, payload in build_entries(lv, a, offs, lens, geom):
            if len(payload) <= inline:
                fixed.append((tag, ft, cnt, payload.ljust(inline, b"\x00")))
            else:
                if len(out) & 1:
                    out += b"\x00"
                fixed.append((tag, ft, cnt,
                              struct.pack(f"<{off_fmt}", len(out))))
                out += payload
        blocks.append(fixed)

    ifd_offs, next_ptr_pos = [], []
    for fixed in blocks:
        if len(out) & 1:
            out += b"\x00"
        ifd_offs.append(len(out))
        if bigtiff:
            out += struct.pack("<Q", len(fixed))
            for tag, ft, cnt, val in fixed:
                out += struct.pack("<HHQ", tag, ft, cnt) + val
            next_ptr_pos.append(len(out))
            out += struct.pack("<Q", 0)
        else:
            out += struct.pack("<H", len(fixed))
            for tag, ft, cnt, val in fixed:
                out += struct.pack("<HHI", tag, ft, cnt) + val
            next_ptr_pos.append(len(out))
            out += struct.pack("<I", 0)
    for i in range(len(ifd_offs) - 1):
        struct.pack_into(f"<{off_fmt}", out, next_ptr_pos[i], ifd_offs[i + 1])
    if bigtiff:
        struct.pack_into("<Q", out, 8, ifd_offs[0])
    else:
        struct.pack_into("<I", out, 4, ifd_offs[0])
    return bytes(out)


# ---------------------------------------------------------------------------
# reader


class _Reader:
    """Random-access byte source over bytes or a seekable file object,
    counting touched bytes (read-amplification evidence for the COG
    window path)."""

    def __init__(self, src):
        self._buf = src if isinstance(src, (bytes, bytearray, memoryview)) else None
        self._f = None if self._buf is not None else src
        self.bytes_read = 0
        self.num_reads = 0

    def read_at(self, off: int, n: int) -> bytes:
        self.bytes_read += n
        self.num_reads += 1
        if self._buf is not None:
            return bytes(self._buf[off:off + n])
        self._f.seek(off)
        return self._f.read(n)


def _open_tiff(r: _Reader) -> tuple[str, bool, int]:
    """(byte_order, is_bigtiff, first_ifd_offset) from the header."""
    head = r.read_at(0, 16)
    if head[:2] == b"II":
        bo = "<"
    elif head[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    (magic,) = struct.unpack_from(bo + "H", head, 2)
    if magic == 42:
        (ifd_off,) = struct.unpack_from(bo + "I", head, 4)
        return bo, False, ifd_off
    if magic == 43:  # BigTIFF
        osz, zero = struct.unpack_from(bo + "HH", head, 4)
        if osz != 8 or zero != 0:
            raise ValueError("bad BigTIFF header")
        (ifd_off,) = struct.unpack_from(bo + "Q", head, 8)
        return bo, True, ifd_off
    raise ValueError("bad TIFF magic")


def _parse_ifd_at(r: _Reader, ifd_off: int, bo: str, big: bool
                  ) -> tuple[dict, int]:
    """Parse one IFD (classic 12-byte or BigTIFF 20-byte entries);
    returns (tags, next_ifd_offset)."""
    if big:
        (n,) = struct.unpack(bo + "Q", r.read_at(ifd_off, 8))
        esz, base, inline = 20, ifd_off + 8, 8
    else:
        (n,) = struct.unpack(bo + "H", r.read_at(ifd_off, 2))
        esz, base, inline = 12, ifd_off + 2, 4
    raw = r.read_at(base, esz * n)
    tags: dict[int, tuple] = {}
    for i in range(n):
        tag, ft = struct.unpack_from(bo + "HH", raw, esz * i)
        if big:
            (cnt,) = struct.unpack_from(bo + "Q", raw, esz * i + 4)
            voff = esz * i + 12
        else:
            (cnt,) = struct.unpack_from(bo + "I", raw, esz * i + 4)
            voff = esz * i + 8
        if ft not in _FT:
            continue
        ch, sz = _FT[ft]
        total = sz * cnt
        if total <= inline:
            payload = raw[voff: voff + total]
        else:
            (off,) = struct.unpack_from(bo + ("Q" if big else "I"),
                                        raw, voff)
            payload = r.read_at(off, total)
        if ft == 2:
            vals = payload.split(b"\x00")[0].decode("latin-1")
        elif ft == 5:
            nums = struct.unpack(bo + f"{2 * cnt}I", payload)
            vals = tuple(nums[2 * k] / max(nums[2 * k + 1], 1)
                         for k in range(cnt))
        else:
            vals = struct.unpack(bo + f"{cnt}{ch}", payload)
        tags[tag] = vals
    (nxt,) = struct.unpack(bo + ("Q" if big else "I"),
                           r.read_at(base + esz * n, 8 if big else 4))
    return tags, nxt


def _parse_ifd(r: _Reader) -> tuple[dict, str]:
    """First-IFD convenience used by the single-level decode paths."""
    bo, big, off = _open_tiff(r)
    tags, _ = _parse_ifd_at(r, off, bo, big)
    return tags, bo


def _info_from_tags(tags: dict, bo: str) -> dict:
    w = int(tags[_T_WIDTH][0])
    h = int(tags[_T_HEIGHT][0])
    bits = int(tags.get(_T_BITS, (8,))[0])
    sfmt = int(tags.get(_T_SFMT, (1,))[0])
    comp_code = int(tags.get(_T_COMP, (1,))[0])
    comp = _COMP_INV.get(comp_code)
    if comp is None:
        raise ValueError(f"unsupported TIFF compression {comp_code}")
    nb = int(tags.get(_T_SPP, (1,))[0])
    if nb > 1:
        if int(tags.get(_T_PLANAR, (1,))[0]) != 1:
            raise ValueError("only chunky (PlanarConfiguration=1) multi-band")
        if len(set(tags.get(_T_BITS, (bits,)))) != 1:
            raise ValueError("per-band BitsPerSample must match")
    dtype = np.dtype(f"{_SFMT_INV[sfmt]}{bits // 8}")
    info = {
        "width": w, "height": h, "dtype": dtype.name, "bands": nb,
        "compression": comp,
        "predictor": int(tags.get(_T_PRED, (1,))[0]),
        "tiled": _T_TILE_OFF in tags,
        "byte_order": bo,
        "is_overview": int(tags.get(_T_SUBFILE, (0,))[0]) == 1,
    }
    if info["tiled"]:
        info["tile_w"] = int(tags[_T_TILE_W][0])
        info["tile_h"] = int(tags[_T_TILE_H][0])
        info["offsets"] = [int(v) for v in tags[_T_TILE_OFF]]
        info["counts"] = [int(v) for v in tags[_T_TILE_CNT]]
    else:
        info["rows_per_strip"] = int(tags.get(_T_RPS, (h,))[0])
        info["offsets"] = [int(v) for v in tags[_T_STRIP_OFF]]
        info["counts"] = [int(v) for v in tags[_T_STRIP_CNT]]
    info["n_segments"] = len(info["offsets"])
    info["data_bytes"] = int(sum(info["counts"]))
    # georeferencing
    scale = tags.get(_T_PIX_SCALE)
    tp = tags.get(_T_TIEPOINT)
    if scale is not None and tp is not None:
        sx, sy = float(scale[0]), float(scale[1])
        i, j, x0, y0 = float(tp[0]), float(tp[1]), float(tp[3]), float(tp[4])
        info["pixel_scale"] = (sx, sy)
        info["origin"] = (x0 - i * sx, y0 + j * sy)
        ox, oy = info["origin"]
        info["bbox"] = (ox, oy - h * sy, ox + w * sx, oy)
    gk = tags.get(_T_GEO_KEYS)
    if gk is not None and len(gk) >= 4:
        nk = int(gk[3])
        epsg = None
        for k in range(nk):
            kid, loc, cnt, val = gk[4 + 4 * k: 8 + 4 * k]
            if kid in (_GK_GEOGRAPHIC_CS, _GK_PROJECTED_CS) and loc == 0:
                epsg = int(val)
        info["epsg"] = epsg
    nd = tags.get(_T_GDAL_NODATA)
    if nd is not None:
        info["nodata"] = float(nd) if isinstance(nd, str) else float(nd[0])
    return info


def parse_info(src) -> dict:
    """IFD-only metadata — never touches pixel segments. ``src`` is
    bytes or a seekable file; on a remote FS this reads a few hundred
    bytes no matter how large the raster is. Walks the whole IFD
    chain: reduced-resolution subfiles land in ``info['overviews']``
    (a list of per-level info dicts, coarsest last)."""
    r = _Reader(src)
    bo, big, off = _open_tiff(r)
    tags, nxt = _parse_ifd_at(r, off, bo, big)
    info = _info_from_tags(tags, bo)
    info["bigtiff"] = big
    ovs = []
    while nxt:
        t2, nxt = _parse_ifd_at(r, nxt, bo, big)
        ovs.append(_info_from_tags(t2, bo))
    info["overviews"] = ovs
    info["header_bytes_read"] = r.bytes_read
    return info


def _segment_geometry(info: dict, idx: int) -> tuple[int, int, int, int]:
    """(y0, x0, seg_rows, seg_cols) of segment idx in the stored grid
    (tiles keep full padded dims; strips clip the last one)."""
    if info["tiled"]:
        tw, th = info["tile_w"], info["tile_h"]
        across = -(-info["width"] // tw)
        ty, tx = divmod(idx, across)
        return ty * th, tx * tw, th, tw
    rps = info["rows_per_strip"]
    y0 = idx * rps
    return y0, 0, min(rps, info["height"] - y0), info["width"]


def _decode_one(r: _Reader, info: dict, idx: int) -> tuple[np.ndarray, int, int]:
    y0, x0, rows, cols = _segment_geometry(info, idx)
    buf = r.read_at(info["offsets"][idx], info["counts"][idx])
    seg = _decode_segment(buf, rows, cols, np.dtype(info["dtype"]),
                          info["compression"], info["predictor"],
                          info["byte_order"], info.get("bands", 1))
    return seg, y0, x0


def _info_at_level(r: _Reader, level: int) -> dict:
    """Walk the IFD chain to ``level`` (0 = full resolution, 1.. =
    overview subfiles) and return that level's info."""
    bo, big, off = _open_tiff(r)
    tags, nxt = _parse_ifd_at(r, off, bo, big)
    for _ in range(level):
        if not nxt:
            raise ValueError(f"no overview level {level}")
        tags, nxt = _parse_ifd_at(r, nxt, bo, big)
    info = _info_from_tags(tags, bo)
    info["bigtiff"] = big
    return info


def decode_geotiff(src, level: int = 0) -> tuple[np.ndarray, dict]:
    """Full decode → ((h, w) or (h, w, bands) array, info dict).
    ``level`` selects an overview subfile (chained IFD)."""
    r = _Reader(src)
    info = _info_at_level(r, level)
    h, w, nb = info["height"], info["width"], info.get("bands", 1)
    shape = (h, w) if nb == 1 else (h, w, nb)
    out = np.zeros(shape, np.dtype(info["dtype"]))
    for idx in range(info["n_segments"]):
        seg, y0, x0 = _decode_one(r, info, idx)
        rows = min(seg.shape[0], h - y0)
        cols = min(seg.shape[1], w - x0)
        out[y0:y0 + rows, x0:x0 + cols] = seg[:rows, :cols]
    return out, info


def decode_window(src, x0: int, y0: int, win_w: int, win_h: int,
                  level: int = 0) -> tuple[np.ndarray, dict]:
    """Decode only the pixel window [y0:y0+win_h, x0:x0+win_w] reading
    only intersecting segments (plus the IFD). ``level`` selects an
    overview subfile — window coordinates are in THAT level's pixel
    grid. Returns (window, info); ``info['window_bytes_read']`` is the
    total bytes touched — the COG read-amplification number the tests
    pin."""
    r = _Reader(src)
    info = _info_at_level(r, level)
    h, w = info["height"], info["width"]
    nb = info.get("bands", 1)
    x1, y1 = min(x0 + win_w, w), min(y0 + win_h, h)
    x0c, y0c = max(x0, 0), max(y0, 0)
    shape = (max(y1 - y0c, 0), max(x1 - x0c, 0))
    out = np.zeros(shape if nb == 1 else shape + (nb,),
                   np.dtype(info["dtype"]))
    for idx in range(info["n_segments"]):
        sy, sx, rows, cols = _segment_geometry(info, idx)
        if sy >= y1 or sy + rows <= y0c or sx >= x1 or sx + cols <= x0c:
            continue
        seg, sy, sx = _decode_one(r, info, idx)
        ry0, ry1 = max(sy, y0c), min(sy + seg.shape[0], y1, h)
        rx0, rx1 = max(sx, x0c), min(sx + seg.shape[1], x1, w)
        out[ry0 - y0c:ry1 - y0c, rx0 - x0c:rx1 - x0c] = \
            seg[ry0 - sy:ry1 - sy, rx0 - sx:rx1 - sx]
    info["window_bytes_read"] = r.bytes_read
    info["window_num_reads"] = r.num_reads
    return out, info
