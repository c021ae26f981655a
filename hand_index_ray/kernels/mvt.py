"""Mapbox Vector Tile codec — from the published vector-tile-spec 2.1
(protobuf wire format + the spec's geometry command encoding; public
knowledge). MVT is the de-facto sink for serving vector data at scale:
a tiled catalog of catchments/footprints ships as one small protobuf
blob per tile. No protobuf library exists in this sandbox, so the wire
format (varints, zigzag, length-delimited fields) is implemented
directly — it is tiny and fully specified.

Schema implemented (vector_tile.proto):
  Tile        { repeated Layer layers = 3; }
  Layer       { version=15 (=2), name=1, repeated Feature features=2,
                repeated string keys=3, repeated Value values=4,
                extent=5 (default 4096) }
  Value       { string=1, float=2, double=3, int=4, uint=5, sint=6,
                bool=7 }
  Feature     { id=1, packed tags=2 (key/value index pairs), type=3
                (1 POINT, 2 LINESTRING, 3 POLYGON), packed geometry=4 }

Geometry commands: integer = (id & 0x7) | (count << 3); MoveTo=1,
LineTo=2, ClosePath=7; parameters are zigzag-encoded cursor deltas.
Winding (spec §4.3.3.3, y-down tile coords): exterior rings have
positive shoelace area, interior rings negative; ClosePath implies the
closing edge, so the first vertex is not repeated.
"""

from __future__ import annotations

import numpy as np

POINT, LINESTRING, POLYGON = 1, 2, 3
DEFAULT_EXTENT = 4096


# ---------------------------------------------------------------------------
# protobuf wire primitives


def _varint(v: int) -> bytes:
    out = bytearray()
    v = int(v)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (int(v) << 1) ^ (int(v) >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _ld(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _read_varint(buf: bytes, pos: int) -> "tuple[int, int]":
    v = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _walk(buf: bytes, lo: int, hi: int):
    """Yield (field_num, wire, value-or-slice, next_pos) over a message."""
    pos = lo
    while pos < hi:
        key, pos = _read_varint(buf, pos)
        num, wire = key >> 3, key & 0x7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            yield num, wire, v
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield num, wire, (pos, pos + ln)
            pos += ln
        elif wire == 5:
            yield num, wire, (pos, pos + 4)
            pos += 4
        elif wire == 1:
            yield num, wire, (pos, pos + 8)
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")


# ---------------------------------------------------------------------------
# values / tags


def _encode_value(v) -> bytes:
    import struct
    if isinstance(v, bool):
        return _field(7, 0) + _varint(1 if v else 0)
    if isinstance(v, (int, np.integer)):
        return _field(6, 0) + _varint(_zigzag(int(v)))  # sint
    if isinstance(v, (float, np.floating)):
        return _field(3, 1) + struct.pack("<d", float(v))
    if isinstance(v, str):
        b = v.encode()
        return _field(1, 2) + _varint(len(b)) + b
    raise TypeError(f"unsupported tag value {type(v)}")


def _decode_value(buf: bytes, lo: int, hi: int):
    import struct
    for num, wire, val in _walk(buf, lo, hi):
        if num == 1:
            return bytes(buf[val[0]:val[1]]).decode()
        if num == 2:
            return struct.unpack_from("<f", buf, val[0])[0]
        if num == 3:
            return struct.unpack_from("<d", buf, val[0])[0]
        if num in (4, 5):
            return int(val)
        if num == 6:
            return _unzigzag(val)
        if num == 7:
            return bool(val)
    return None


# ---------------------------------------------------------------------------
# geometry commands


def _ring_area2(x: np.ndarray, y: np.ndarray) -> int:
    return int(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _encode_geometry(gtype: int, parts: list, cursor=(0, 0)) -> "list[int]":
    """parts: for POLYGON a list of parts, each a list of (n, 2) int
    OPEN rings (no repeated closing vertex); for LINESTRING a list of
    (n, 2) paths; for POINT one (n, 2) array. Returns command ints."""
    cx, cy = cursor
    cmds: list[int] = []

    def move_line(pts: np.ndarray, close: bool):
        nonlocal cx, cy
        pts = np.asarray(pts, dtype=np.int64)
        cmds.append((1 & 0x7) | (1 << 3))  # MoveTo count 1
        dx, dy = int(pts[0, 0]) - cx, int(pts[0, 1]) - cy
        cmds.extend((_zigzag(dx), _zigzag(dy)))
        cx, cy = int(pts[0, 0]), int(pts[0, 1])
        rest = pts[1:]
        if len(rest):
            cmds.append((2 & 0x7) | (len(rest) << 3))  # LineTo
            for px, py in rest:
                cmds.extend((_zigzag(int(px) - cx), _zigzag(int(py) - cy)))
                cx, cy = int(px), int(py)
        if close:
            cmds.append((7 & 0x7) | (1 << 3))  # ClosePath

    if gtype == POINT:
        pts = np.asarray(parts, dtype=np.int64).reshape(-1, 2)
        cmds.append((1 & 0x7) | (len(pts) << 3))
        for px, py in pts:
            cmds.extend((_zigzag(int(px) - cx), _zigzag(int(py) - cy)))
            cx, cy = int(px), int(py)
    elif gtype == LINESTRING:
        for path in parts:
            move_line(np.asarray(path), close=False)
    elif gtype == POLYGON:
        for part in parts:
            for j, ring in enumerate(part):
                r = np.asarray(ring, dtype=np.int64)
                if len(r) > 1 and (r[0] == r[-1]).all():
                    r = r[:-1]  # ClosePath implies the closing edge
                a2 = _ring_area2(r[:, 0], r[:, 1])
                # spec winding: exterior positive, holes negative
                if (j == 0) != (a2 > 0):
                    r = r[::-1]
                move_line(r, close=True)
    else:
        raise ValueError(f"bad geometry type {gtype}")
    return cmds


def _decode_geometry(gtype: int, cmds: "list[int]"):
    """Command ints → POINT: (n, 2); LINESTRING: list of paths;
    POLYGON: list of parts (each a list of OPEN rings, exterior
    first)."""
    pos = 0
    cx = cy = 0
    rings = []
    cur = None
    while pos < len(cmds):
        cid = cmds[pos] & 0x7
        count = cmds[pos] >> 3
        pos += 1
        if cid == 1:  # MoveTo
            if cur:
                rings.append(("open", np.array(cur, np.int64)))
            cur = []
            for _ in range(count):
                cx += _unzigzag(cmds[pos]); cy += _unzigzag(cmds[pos + 1])
                pos += 2
                cur.append((cx, cy))
        elif cid == 2:  # LineTo
            if cur is None:
                raise ValueError("LineTo before MoveTo")
            for _ in range(count):
                cx += _unzigzag(cmds[pos]); cy += _unzigzag(cmds[pos + 1])
                pos += 2
                cur.append((cx, cy))
        elif cid == 7:  # ClosePath
            if cur is None:
                raise ValueError("ClosePath before MoveTo")
            rings.append(("closed", np.array(cur, np.int64)))
            cur = None
        else:
            raise ValueError(f"bad command id {cid}")
    if cur:
        rings.append(("open", np.array(cur, np.int64)))
    if gtype == POINT:
        return rings[0][1] if rings else np.zeros((0, 2), np.int64)
    if gtype == LINESTRING:
        return [r for _, r in rings]
    parts = []
    for kind, r in rings:
        if kind != "closed":
            raise ValueError("polygon ring missing ClosePath")
        a2 = _ring_area2(r[:, 0], r[:, 1])
        if a2 > 0 or not parts:  # exterior starts a new part
            parts.append([r])
        else:
            parts[-1].append(r)
    return parts


# ---------------------------------------------------------------------------
# tile encode / decode


def encode_tile(layers: "list[dict]") -> bytes:
    """layers: [{name, extent?, features: [{id?, type, geometry,
    tags?: dict}]}] → one Tile blob. Geometry input per _encode_geometry;
    tag keys/values are dictionary-deduplicated per layer (spec §4.4)."""
    out = bytearray()
    for layer in layers:
        keys: list[str] = []
        vals: list = []
        kidx: dict = {}
        vidx: dict = {}
        feats = []
        for f in layer["features"]:
            tag_ints = []
            for k, v in (f.get("tags") or {}).items():
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                vk = (type(v).__name__, v)
                if vk not in vidx:
                    vidx[vk] = len(vals)
                    vals.append(v)
                tag_ints.extend((kidx[k], vidx[vk]))
            cmds = _encode_geometry(f["type"], f["geometry"])
            body = bytearray()
            if f.get("id") is not None:
                body += _field(1, 0) + _varint(int(f["id"]))
            if tag_ints:
                payload = b"".join(_varint(t) for t in tag_ints)
                body += _ld(2, payload)
            body += _field(3, 0) + _varint(f["type"])
            body += _ld(4, b"".join(_varint(c) for c in cmds))
            feats.append(bytes(body))
        lbody = bytearray()
        lbody += _field(15, 0) + _varint(2)  # version
        name = layer["name"].encode()
        lbody += _ld(1, name)
        for fb in feats:
            lbody += _ld(2, fb)
        for k in keys:
            lbody += _ld(3, k.encode())
        for v in vals:
            lbody += _ld(4, _encode_value(v))
        ext = int(layer.get("extent", DEFAULT_EXTENT))
        if ext != DEFAULT_EXTENT:
            lbody += _field(5, 0) + _varint(ext)
        out += _ld(3, bytes(lbody))
    return bytes(out)


def decode_tile(buf: bytes) -> "list[dict]":
    buf = bytes(buf)
    layers = []
    for num, wire, val in _walk(buf, 0, len(buf)):
        if num != 3 or wire != 2:
            continue
        lo, hi = val
        name, version, extent = "", None, DEFAULT_EXTENT
        keys, vals, feat_spans = [], [], []
        for n2, w2, v2 in _walk(buf, lo, hi):
            if n2 == 15:
                version = v2
            elif n2 == 1:
                name = bytes(buf[v2[0]:v2[1]]).decode()
            elif n2 == 2:
                feat_spans.append(v2)
            elif n2 == 3:
                keys.append(bytes(buf[v2[0]:v2[1]]).decode())
            elif n2 == 4:
                vals.append(_decode_value(buf, v2[0], v2[1]))
            elif n2 == 5:
                extent = v2
        if version != 2:
            raise ValueError(f"unsupported MVT layer version {version}")
        features = []
        for flo, fhi in feat_spans:
            fid, ftype, tag_ints, cmds = None, None, [], []
            for n3, w3, v3 in _walk(buf, flo, fhi):
                if n3 == 1:
                    fid = v3
                elif n3 == 3:
                    ftype = v3
                elif n3 == 2:
                    p = v3[0]
                    while p < v3[1]:
                        t, p = _read_varint(buf, p)
                        tag_ints.append(t)
                elif n3 == 4:
                    p = v3[0]
                    while p < v3[1]:
                        c, p = _read_varint(buf, p)
                        cmds.append(c)
            tags = {keys[tag_ints[i]]: vals[tag_ints[i + 1]]
                    for i in range(0, len(tag_ints), 2)}
            features.append({"id": fid, "type": ftype, "tags": tags,
                             "geometry": _decode_geometry(ftype, cmds)})
        layers.append({"name": name, "extent": extent,
                       "features": features})
    return layers
