"""WKT (well-known text) emit/parse for the engine's ragged geometry
column — the interchange format every GIS tool accepts (ISO 13249 /
OGC Simple Features; public). The engine's storage format is WKB; WKT
is the human/SQL boundary: exports, oracle checks, debugging dumps.

Supported: POINT, POLYGON, MULTIPOLYGON (the engine's geometry
universe — kernels/wkb.py decodes exactly these). Integer-valued
coordinates print without a decimal point (matching SQL string
building on integer grids); others print via repr (shortest float64
round-trip).
"""

from __future__ import annotations

import numpy as np

from . import wkb as wkblib


def _num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _ring_str(coords: np.ndarray) -> str:
    return "(" + ", ".join(f"{_num(x)} {_num(y)}" for x, y in coords) + ")"


def encode_wkt(r: "wkblib.Ragged") -> "list[str]":
    """One WKT string per geometry. Single-part → POLYGON, multi-part
    → MULTIPOLYGON, zero-part → POLYGON EMPTY, single 1-point ring →
    POINT."""
    out = []
    for g in range(len(r)):
        p0, p1 = r.geom_part_off[g], r.geom_part_off[g + 1]
        if p1 == p0:
            out.append("POLYGON EMPTY")
            continue
        parts = []
        is_point = False
        for p in range(p0, p1):
            r0, r1 = r.part_ring_off[p], r.part_ring_off[p + 1]
            rings = []
            for ri in range(r0, r1):
                c0, c1 = r.ring_coord_off[ri], r.ring_coord_off[ri + 1]
                pts = r.coords[c0:c1]
                if p1 - p0 == 1 and r1 - r0 == 1 and len(pts) == 1:
                    is_point = True
                    out.append(f"POINT ({_num(pts[0, 0])}"
                               f" {_num(pts[0, 1])})")
                    break
                rings.append(_ring_str(pts))
            if is_point:
                break
            parts.append("(" + ", ".join(rings) + ")")
        if is_point:
            continue
        if len(parts) == 1:
            out.append("POLYGON " + parts[0])
        else:
            out.append("MULTIPOLYGON (" + ", ".join(parts) + ")")
    return out


def decode_wkt(strs) -> "wkblib.Ragged":
    """Parse WKT strings into one Ragged structure. Tolerates
    arbitrary whitespace; rejects unsupported types."""
    geoms = []
    for s in strs:
        s = s.strip()
        up = s.upper()
        if up.startswith("POINT"):
            body = s[s.index("(") + 1:s.rindex(")")]
            x, y = body.replace(",", " ").split()
            geoms.append([[np.array([[float(x), float(y)]])]])
            continue
        if up.startswith("MULTIPOLYGON"):
            depth_parts = _split_groups(s[s.index("("):], 1)
            parts = []
            for pp in depth_parts:
                parts.append([_ring_pts(rr)
                              for rr in _split_groups(pp, 1)])
            geoms.append(parts)
            continue
        if up.startswith("POLYGON"):
            if "EMPTY" in up:
                geoms.append([])
                continue
            rings = [_ring_pts(rr)
                     for rr in _split_groups(s[s.index("("):], 1)]
            geoms.append([rings])
            continue
        raise ValueError(f"unsupported WKT type: {s[:24]!r}")
    return wkblib.from_parts(geoms)


def _split_groups(s: str, depth_want: int) -> "list[str]":
    """Split the children one level below the outer parens: for
    '((a), (b))' → ['(a)', '(b)'] including their own parens."""
    out, depth, start = [], 0, None
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
            if depth == depth_want + 1:
                start = i
        elif ch == ")":
            if depth == depth_want + 1 and start is not None:
                out.append(s[start:i + 1])
                start = None
            depth -= 1
    return out


def _ring_pts(ring: str) -> np.ndarray:
    body = ring.strip()[1:-1]
    pts = [tuple(map(float, p.split())) for p in body.split(",")]
    return np.asarray(pts, dtype=np.float64)
