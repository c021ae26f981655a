"""EXIF (APP1/TIFF-IFD) metadata — pure numpy/stdlib, from the public
EXIF 2.3 / TIFF 6.0 specs.

Real image corpora carry EXIF: capture time, camera make/model, GPS
position, and — operationally most important — ORIENTATION, which an
ingest pipeline must apply before any pixel-space operator (phash,
resize, footprint alignment) or mirrored/rotated duplicates evade
dedup. This module provides:

- ``parse_exif(jpeg_bytes)``: locate the APP1 "Exif" segment, walk the
  TIFF IFDs (both byte orders, offset-chained IFDs, Exif + GPS
  sub-IFDs), return typed fields. Unknown tags are ignored, malformed
  segments raise ValueError, absent EXIF returns {}.
- ``build_exif_app1(...)``: emit a spec-correct APP1 segment (used by
  tests and the synthetic corpus — this sandbox has no real camera
  files) and ``insert_app1`` to splice it into a JFIF stream.
- ``apply_orientation(img, o)``: the 8 EXIF orientation transforms as
  numpy views (rot90/flip — zero-copy until materialized).

Scale shape: parsing is a few dozen header bytes per image inside
map_batches (no pixel work); orientation transforms are O(pixels)
numpy views. Both belong in the existing decode stage, not a separate
pass over the heavy bytes column.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

# tag → friendly name (IFD0 + Exif sub-IFD subset an ingest cares about)
_TAGS = {
    0x010F: "make", 0x0110: "model", 0x0112: "orientation",
    0x0132: "datetime", 0x8769: "_exif_ifd", 0x8825: "_gps_ifd",
    0x829A: "exposure_time", 0x829D: "f_number", 0x8827: "iso",
    0x9003: "datetime_original", 0xA002: "pixel_x", 0xA003: "pixel_y",
}
_GPS_TAGS = {0x0001: "gps_lat_ref", 0x0002: "gps_lat",
             0x0003: "gps_lon_ref", 0x0004: "gps_lon",
             0x0005: "gps_alt_ref", 0x0006: "gps_alt"}


def _read_ifd(buf: bytes, off: int, bo: str, tags: dict, out: dict):
    if off + 2 > len(buf):
        raise ValueError("truncated IFD")
    n = struct.unpack(bo + "H", buf[off:off + 2])[0]
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(buf):
            raise ValueError("truncated IFD entry")
        tag, ty, cnt = struct.unpack(bo + "HHI", buf[e:e + 8])
        name = tags.get(tag)
        if name is None or ty not in _TYPE_SIZES:
            continue
        size = _TYPE_SIZES[ty] * cnt
        if size <= 4:
            voff = e + 8
        else:
            voff = struct.unpack(bo + "I", buf[e + 8:e + 12])[0]
            if voff + size > len(buf):
                raise ValueError("IFD value out of bounds")
        raw = buf[voff:voff + size]
        if ty == 2:  # ASCII
            out[name] = raw.rstrip(b"\0").decode("ascii", "replace")
        elif ty == 3:  # SHORT
            v = struct.unpack(bo + f"{cnt}H", raw)
            out[name] = v[0] if cnt == 1 else list(v)
        elif ty in (1, 7):  # BYTE / UNDEFINED
            out[name] = raw if cnt > 1 else raw[0]
        elif ty == 4:  # LONG
            v = struct.unpack(bo + f"{cnt}I", raw)
            out[name] = v[0] if cnt == 1 else list(v)
        elif ty == 9:  # SLONG
            v = struct.unpack(bo + f"{cnt}i", raw)
            out[name] = v[0] if cnt == 1 else list(v)
        elif ty in (5, 10):  # RATIONAL / SRATIONAL
            fmt = "I" if ty == 5 else "i"
            v = struct.unpack(bo + f"{2 * cnt}{fmt}", raw)
            rs = [(v[2 * j], v[2 * j + 1]) for j in range(cnt)]
            out[name] = rs[0] if cnt == 1 else rs
    nxt = off + 2 + 12 * n
    if nxt + 4 <= len(buf):
        return struct.unpack(bo + "I", buf[nxt:nxt + 4])[0]
    return 0


def parse_exif(data: bytes) -> dict:
    """JPEG bytes → dict of EXIF fields ({} when no APP1 Exif segment).

    GPS rationals are converted to signed decimal degrees
    (``gps_lat_deg`` / ``gps_lon_deg``, float) alongside the raw DMS."""
    arr = data
    if len(arr) < 4 or arr[0] != 0xFF or arr[1] != 0xD8:
        return {}
    pos = 2
    tiff = None
    while pos + 4 <= len(arr):
        if arr[pos] != 0xFF:
            break
        m = arr[pos + 1]
        if m == 0xD9 or m == 0xDA:
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        ln = (arr[pos + 2] << 8) | arr[pos + 3]
        if m == 0xE1 and arr[pos + 4:pos + 10] == b"Exif\x00\x00":
            tiff = bytes(arr[pos + 10:pos + 2 + ln])
            break
        pos += 2 + ln
    if tiff is None:
        return {}
    if len(tiff) < 8:
        raise ValueError("truncated TIFF header")
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("bad TIFF byte order")
    if struct.unpack(bo + "H", tiff[2:4])[0] != 42:
        raise ValueError("bad TIFF magic")
    ifd0 = struct.unpack(bo + "I", tiff[4:8])[0]
    out: dict = {}
    _read_ifd(tiff, ifd0, bo, _TAGS, out)
    exif_off = out.pop("_exif_ifd", None)
    if exif_off is not None:
        _read_ifd(tiff, int(exif_off), bo, _TAGS, out)
    gps_off = out.pop("_gps_ifd", None)
    if gps_off is not None:
        _read_ifd(tiff, int(gps_off), bo, _GPS_TAGS, out)
        for axis, ref_neg in (("lat", "S"), ("lon", "W")):
            dms = out.get(f"gps_{axis}")
            ref = out.get(f"gps_{axis}_ref")
            if isinstance(dms, list) and len(dms) == 3:
                deg = sum((n / d if d else 0.0) / 60 ** i
                          for i, (n, d) in enumerate(dms))
                if ref == ref_neg:
                    deg = -deg
                out[f"gps_{axis}_deg"] = deg
    return out


def apply_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """Apply an EXIF orientation (1-8) → upright image. Values follow
    the spec's row0/col0 table; 1 (or anything unrecognized) is
    identity. Returns a view where possible."""
    o = int(orientation)
    if o == 2:
        return img[:, ::-1]
    if o == 3:
        return img[::-1, ::-1]
    if o == 4:
        return img[::-1, :]
    if o == 5:
        return np.swapaxes(img, 0, 1)
    if o == 6:
        return np.rot90(img, k=3)
    if o == 7:  # transverse: flip across the anti-diagonal
        return np.rot90(img, k=1)[:, ::-1]
    if o == 8:
        return np.rot90(img, k=1)
    return img


# --- APP1 builder (tests + synthetic corpus) ----------------------------------

def _deg_to_dms(deg: float) -> list[tuple[int, int]]:
    a = abs(deg)
    d = int(a)
    m = int((a - d) * 60)
    s = round(((a - d) * 60 - m) * 60 * 10000)
    return [(d, 1), (m, 1), (s, 10000)]


def build_exif_app1(orientation: int = 1, make: str = "", model: str = "",
                    datetime_str: str = "", lat: "float | None" = None,
                    lon: "float | None" = None,
                    lat_dms=None, lon_dms=None) -> bytes:
    """Build a little-endian APP1 Exif segment (marker + length + TIFF).

    ``lat_dms``/``lon_dms``: exact [(num, den)]×3 rationals (sign via
    the paired ``lat``/``lon`` which then only supplies the N/S/E/W
    ref) — float inputs go through ``_deg_to_dms`` rounding instead."""
    entries0 = []  # (tag, type, count, packed-value-or-data)

    def ascii_e(tag, s):
        b = s.encode("ascii") + b"\0"
        entries0.append((tag, 2, len(b), b))

    if make:
        ascii_e(0x010F, make)
    if model:
        ascii_e(0x0110, model)
    entries0.append((0x0112, 3, 1, struct.pack("<H", orientation) + b"\0\0"))
    if datetime_str:
        ascii_e(0x0132, datetime_str)
    gps_entries = []
    if lat is not None and lon is not None:
        gps_entries.append((0x0001, 2, 2,
                            (b"N" if lat >= 0 else b"S") + b"\0"))
        gps_entries.append((0x0002, 5, 3, lat_dms or _deg_to_dms(lat)))
        gps_entries.append((0x0003, 2, 2,
                            (b"E" if lon >= 0 else b"W") + b"\0"))
        gps_entries.append((0x0004, 5, 3, lon_dms or _deg_to_dms(lon)))
        entries0.append((0x8825, 4, 1, None))  # GPS IFD pointer, patched

    def pack_ifd(entries, base_off):
        """entries → (ifd_bytes, extra_data, value offsets resolved).
        base_off = offset of the IFD within the TIFF body."""
        head = struct.pack("<H", len(entries))
        body = b""
        extra = b""
        extra_off = base_off + 2 + 12 * len(entries) + 4
        for tag, ty, cnt, val in entries:
            if val is None:  # pointer patched by caller
                body += struct.pack("<HHI", tag, ty, cnt) + b"\0\0\0\0"
                continue
            if ty == 5:  # rationals always overflow 4 bytes
                raw = b"".join(struct.pack("<II", n, d) for n, d in val)
            else:
                raw = val
            size = _TYPE_SIZES[ty] * cnt
            if size <= 4:
                body += struct.pack("<HHI", tag, ty, cnt) + raw[:4].ljust(4, b"\0")
            else:
                body += struct.pack("<HHI", tag, ty, cnt) \
                    + struct.pack("<I", extra_off + len(extra))
                extra += raw
        return head + body + struct.pack("<I", 0) + extra

    ifd0 = pack_ifd(entries0, 8)
    tiff = b"II" + struct.pack("<HI", 42, 8) + ifd0
    if gps_entries:
        gps_off = len(tiff)
        gps = pack_ifd(gps_entries, gps_off)
        tiff += gps
        # patch the GPS pointer (tag 0x8825) value slot
        idx = tiff.find(struct.pack("<HHI", 0x8825, 4, 1))
        tiff = tiff[:idx + 8] + struct.pack("<I", gps_off) + tiff[idx + 12:]
    seg = b"Exif\x00\x00" + tiff
    return b"\xFF\xE1" + struct.pack(">H", len(seg) + 2) + seg


def insert_app1(jpeg_bytes: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI (before APP0/JFIF is also
    legal; after keeps JFIF first, which strict readers prefer)."""
    if jpeg_bytes[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    # skip an APP0 if present so APP1 follows it
    pos = 2
    if jpeg_bytes[pos:pos + 2] == b"\xFF\xE0":
        ln = (jpeg_bytes[pos + 2] << 8) | jpeg_bytes[pos + 3]
        pos += 2 + ln
    return jpeg_bytes[:pos] + app1 + jpeg_bytes[pos:]
