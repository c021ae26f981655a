"""WKB polygon codec over ragged numpy arrays.

The reference keeps geometry as opaque WKB BLOBs in storage
(reference schema/hand-index-ver-fim100.sql:8, produced by
``ST_AsWKB(ST_Force2D(...))`` at load.py:163) and decodes row-at-a-time
with shapely at query time (query_geojson.py:129-131). Here the column
of WKB values decodes into one ragged structure — a flat ``(N, 2)``
float64 coordinate array plus three offset arrays — so every downstream
geometry kernel (area, PIP, clip, simplify) runs as vectorized numpy
over the flat coordinate buffer instead of per-row Python objects.

Supported: 2-D Point(1) / Polygon(3) / MultiPolygon(6), little- or
big-endian on decode; encode always emits little-endian ISO WKB with
closed rings (first vertex == last vertex), like the reference's BLOBs.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

WKB_POINT = 1
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6


@dataclass
class Ragged:
    """Ragged geometry column: three nested offset levels.

    coords:            float64 (N, 2) — all vertices, rings closed
    ring_coord_off:    int64 (R+1,)   — ring r spans coords[ring_coord_off[r]:ring_coord_off[r+1]]
    part_ring_off:     int64 (P+1,)   — part p spans rings [part_ring_off[p], part_ring_off[p+1])
    geom_part_off:     int64 (G+1,)   — geometry g spans parts [geom_part_off[g], geom_part_off[g+1])

    A Polygon is a geometry with one part; a MultiPolygon has >1 part;
    ring 0 of a part is the outer shell, the rest are holes.
    """

    coords: np.ndarray
    ring_coord_off: np.ndarray
    part_ring_off: np.ndarray
    geom_part_off: np.ndarray

    def __len__(self) -> int:
        return len(self.geom_part_off) - 1

    def num_parts(self) -> int:
        return len(self.part_ring_off) - 1

    def geom_slice(self, g: int) -> "Ragged":
        """Single-geometry view (copies offsets, shares coords)."""
        p0, p1 = self.geom_part_off[g], self.geom_part_off[g + 1]
        r0, r1 = self.part_ring_off[p0], self.part_ring_off[p1]
        c0, c1 = self.ring_coord_off[r0], self.ring_coord_off[r1]
        return Ragged(
            coords=self.coords[c0:c1],
            ring_coord_off=self.ring_coord_off[r0 : r1 + 1] - c0,
            part_ring_off=self.part_ring_off[p0 : p1 + 1] - r0,
            geom_part_off=np.array([0, p1 - p0], dtype=np.int64),
        )


def from_parts(geoms: list[list[list[np.ndarray]]]) -> Ragged:
    """Build a Ragged from nested lists: geoms → parts → rings (k,2) arrays.

    Rings are closed automatically if the first vertex != last vertex.
    """
    coords: list[np.ndarray] = []
    ring_off = [0]
    part_off = [0]
    geom_off = [0]
    n = 0
    for parts in geoms:
        for rings in parts:
            for ring in rings:
                ring = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
                if len(ring) and not np.array_equal(ring[0], ring[-1]):
                    ring = np.vstack([ring, ring[:1]])
                coords.append(ring)
                n += len(ring)
                ring_off.append(n)
            part_off.append(len(ring_off) - 1)
        geom_off.append(len(part_off) - 1)
    allc = np.concatenate(coords, axis=0) if coords else np.empty((0, 2))
    return Ragged(
        coords=np.ascontiguousarray(allc, dtype=np.float64),
        ring_coord_off=np.asarray(ring_off, dtype=np.int64),
        part_ring_off=np.asarray(part_off, dtype=np.int64),
        geom_part_off=np.asarray(geom_off, dtype=np.int64),
    )


def decode(wkbs) -> Ragged:
    """Decode an iterable of WKB bytes into one Ragged structure.

    Header fields are parsed per-geometry (O(G) Python); the coordinate
    payload — the bulk of the bytes — is lifted with ``np.frombuffer``
    per ring, so large polygons stay vectorized.
    """
    coords: list[np.ndarray] = []
    ring_off = [0]
    part_off = [0]
    geom_off = [0]
    n = 0
    for raw in wkbs:
        if raw is None:
            geom_off.append(len(part_off) - 1)  # empty geometry: zero parts
            continue
        buf = bytes(raw)
        pos = 0

        def read_header(pos: int) -> tuple[str, int, int]:
            bo = "<" if buf[pos] == 1 else ">"
            (gtype,) = struct.unpack_from(bo + "I", buf, pos + 1)
            gtype = gtype & 0xFF  # mask ISO Z/M/SRID flags
            return bo, gtype, pos + 5

        bo, gtype, pos = read_header(0)
        if gtype == WKB_MULTIPOLYGON:
            (nparts,) = struct.unpack_from(bo + "I", buf, pos)
            pos += 4
            polys = nparts
        elif gtype in (WKB_POLYGON, WKB_POINT):
            polys = 1
        else:
            raise ValueError(f"unsupported WKB geometry type {gtype}")

        if gtype == WKB_POINT:
            xy = np.frombuffer(buf, dtype=("<f8" if bo == "<" else ">f8"), count=2, offset=pos)
            ring = np.array([xy, xy], dtype=np.float64)  # degenerate closed ring
            coords.append(ring)
            n += 2
            ring_off.append(n)
            part_off.append(len(ring_off) - 1)
            geom_off.append(len(part_off) - 1)
            continue

        for p in range(polys):
            if gtype == WKB_MULTIPOLYGON:
                bo, sub, pos = read_header(pos)
                if sub != WKB_POLYGON:
                    raise ValueError(f"multipolygon part has type {sub}")
            (nrings,) = struct.unpack_from(bo + "I", buf, pos)
            pos += 4
            for _ in range(nrings):
                (npts,) = struct.unpack_from(bo + "I", buf, pos)
                pos += 4
                arr = np.frombuffer(
                    buf, dtype=("<f8" if bo == "<" else ">f8"), count=npts * 2, offset=pos
                ).astype(np.float64, copy=False).reshape(npts, 2)
                pos += npts * 16
                coords.append(arr)
                n += npts
                ring_off.append(n)
            part_off.append(len(ring_off) - 1)
        geom_off.append(len(part_off) - 1)

    allc = np.concatenate(coords, axis=0) if coords else np.empty((0, 2))
    return Ragged(
        coords=np.ascontiguousarray(allc, dtype=np.float64),
        ring_coord_off=np.asarray(ring_off, dtype=np.int64),
        part_ring_off=np.asarray(part_off, dtype=np.int64),
        geom_part_off=np.asarray(geom_off, dtype=np.int64),
    )


def encode(r: Ragged) -> list[bytes]:
    """Encode each geometry as little-endian ISO WKB bytes.

    One part → Polygon(3); several parts → MultiPolygon(6); zero parts
    → None (null geometry, matching the reference's NULL-geometry rows
    filtered at load.py:143,171).
    """
    out: list[bytes | None] = []
    for g in range(len(r)):
        p0, p1 = r.geom_part_off[g], r.geom_part_off[g + 1]
        nparts = p1 - p0
        if nparts == 0:
            out.append(None)
            continue
        parts_b: list[bytes] = []
        for p in range(p0, p1):
            r0, r1 = r.part_ring_off[p], r.part_ring_off[p + 1]
            rings_b = []
            for ri in range(r0, r1):
                c0, c1 = r.ring_coord_off[ri], r.ring_coord_off[ri + 1]
                pts = r.coords[c0:c1]
                rings_b.append(struct.pack("<I", len(pts)) + pts.astype("<f8").tobytes())
            parts_b.append(struct.pack("<BII", 1, WKB_POLYGON, r1 - r0) + b"".join(rings_b))
        if nparts == 1:
            out.append(parts_b[0])
        else:
            out.append(struct.pack("<BII", 1, WKB_MULTIPOLYGON, nparts) + b"".join(parts_b))
    return out


def encode_box(minx: np.ndarray, miny: np.ndarray, maxx: np.ndarray, maxy: np.ndarray) -> list[bytes]:
    """Vectorized WKB encode of axis-aligned rectangles (CCW closed rings).

    Fast path for tile footprints — builds all headers+coords in one
    numpy pass instead of per-geometry Python.
    """
    n = len(minx)
    header = struct.pack("<BIII", 1, WKB_POLYGON, 1, 5)
    pts = np.empty((n, 5, 2), dtype="<f8")
    pts[:, 0, 0] = minx; pts[:, 0, 1] = miny
    pts[:, 1, 0] = maxx; pts[:, 1, 1] = miny
    pts[:, 2, 0] = maxx; pts[:, 2, 1] = maxy
    pts[:, 3, 0] = minx; pts[:, 3, 1] = maxy
    pts[:, 4, 0] = minx; pts[:, 4, 1] = miny
    body = pts.reshape(n, -1).view(np.uint8)
    return [header + body[i].tobytes() for i in range(n)]
