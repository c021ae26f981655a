"""H3-style icosahedral aperture-7 hexagonal cells, vectorized numpy.

SUPERSEDED for cell ids by ``kernels/h3exact.py`` (round 3): the engine
now emits bit-exact Uber H3 indexes (golden-vector validated) for
``h3_r5..r9``, ``h3_index`` and fixtures. This module remains for its
lattice/ring utilities and as the documented first-generation design.

The reference assigns one H3 cell per catchment from its centroid via
DuckDB's h3 extension (``h3_latlng_to_cell(lat, lon, res)``,
reference load.py:164-168), and uses that cell as both a column and
the hive partition key (load.py:279-283). This module provides the
same operation natively — multi-resolution (the north rule requires
res 5–9 keys per footprint) and vectorized over point arrays.

Faithful to the published H3 *design* (gnomonic projection onto the 20
icosahedron faces, aperture-7 hex lattice whose spacing shrinks by √7
per resolution with a ~19.1° lattice rotation, 64-bit packed ids):
  id = [1 zero][4 mode=1][4 res][5 face][25 q+offset][25 r+offset]

Deviation, stated plainly: the canonical H3 library pins a specific
icosahedron orientation and base-cell numbering (122 base cells with
published lookup tables) that cannot be reproduced from first
principles, and no h3 package or network is available in this sandbox
to source them. Cells here are therefore *not bit-identical* to Uber
H3 ids; every engine semantic that uses them (multi-res assignment,
partition keys, disk/ring expansion, parent containment-by-center) is
internally consistent and resolution-compatible with H3 (cell areas
match H3's published per-resolution areas). The S2 kernel
(kernels/s2.py) is exact and is the primary key family.
"""

from __future__ import annotations

import numpy as np

MODE = 1
MAX_RES = 15
_OFF = 1 << 24  # axial coordinate offset (25-bit fields)

# --- icosahedron --------------------------------------------------------------

_PHI = (1.0 + np.sqrt(5.0)) / 2.0


def _build_faces() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    v = []
    for a in (-1.0, 1.0):
        for b in (-_PHI, _PHI):
            v.append((0.0, a, b))
            v.append((a, b, 0.0))
            v.append((b, 0.0, a))
    verts = np.array(v)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    # faces = triples of mutually nearest vertices
    d = verts @ verts.T
    edge_cos = np.sort(d.ravel())[::-1]
    # adjacency: the 2nd-highest distinct dot value is the edge length
    thresh = 0.7  # icosahedron edge dot ≈ 0.447..., vertex self = 1; adjacency dot = 1/sqrt(5) ≈ 0.447
    adj = (d > 0.4) & (d < 0.999)
    faces = set()
    for i in range(12):
        for j in range(i + 1, 12):
            if not adj[i, j]:
                continue
            for k in range(j + 1, 12):
                if adj[i, k] and adj[j, k]:
                    faces.add((i, j, k))
    assert len(faces) == 20, len(faces)
    centers = []
    exs = []
    eys = []
    # deterministic face order: sort by rounded center coords
    tri = sorted(faces, key=lambda t: tuple(np.round(verts[list(t)].mean(axis=0), 9)))
    for t in tri:
        c = verts[list(t)].mean(axis=0)
        c = c / np.linalg.norm(c)
        ex = verts[t[0]] / np.dot(verts[t[0]], c) - c  # gnomonic image of v0
        ex = ex / np.linalg.norm(ex)
        ey = np.cross(c, ex)
        centers.append(c)
        exs.append(ex)
        eys.append(ey)
    return np.array(centers), np.array(exs), np.array(eys)


_FC, _EX, _EY = _build_faces()

# aperture-7 geometry: center spacing shrinks by √7 per res, lattice rotates
# by atan(√3/5) ≈ 19.1066° (the index-7 hex sublattice angle, same as H3).
_ALPHA = np.arctan2(np.sqrt(3.0), 5.0)
# D0 chosen so cell areas track H3's published per-res average areas
# (res-0 avg area 4.357e6 km² on a 6371 km sphere → hex spacing 0.352 rad).
_D0 = 0.3520


def _res_size(res: np.ndarray | int) -> np.ndarray:
    """Hex circumradius (gnomonic units) at resolution(s)."""
    r = np.asarray(res, dtype=np.float64)
    return (_D0 / np.sqrt(3.0)) * 7.0 ** (-r / 2.0)


# --- encode -------------------------------------------------------------------


def _face_of(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    dots = x[:, None] * _FC[:, 0][None, :] + y[:, None] * _FC[:, 1][None, :] + z[:, None] * _FC[:, 2][None, :]
    return np.argmax(dots, axis=1).astype(np.int64)


def _gnomonic(x: np.ndarray, y: np.ndarray, z: np.ndarray, face: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n = _FC[face]
    dot = x * n[:, 0] + y * n[:, 1] + z * n[:, 2]
    px = x / dot - n[:, 0]
    py = y / dot - n[:, 1]
    pz = z / dot - n[:, 2]
    ex, ey = _EX[face], _EY[face]
    return (px * ex[:, 0] + py * ex[:, 1] + pz * ex[:, 2],
            px * ey[:, 0] + py * ey[:, 1] + pz * ey[:, 2])


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def lonlat_to_cell(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """lat/lng degrees → hex cell id at ``res`` — the engine's
    ``h3_latlng_to_cell`` (reference load.py:164-168)."""
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    cp = np.cos(phi)
    x, y, z = cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)
    face = _face_of(x, y, z)
    fx, fy = _gnomonic(x, y, z, face)
    # rotate into this resolution's lattice frame
    th = res * _ALPHA
    c, s = np.cos(th), np.sin(th)
    rx = c * fx + s * fy
    ry = -s * fx + c * fy
    size = float(_res_size(res))
    qf = (np.sqrt(3.0) / 3.0 * rx - ry / 3.0) / size
    rf = (2.0 / 3.0 * ry) / size
    q, r = _cube_round(qf, rf)
    return pack(face, q, r, res)


def pack(face: np.ndarray, q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    cid = (
        (np.uint64(MODE) << np.uint64(59))
        | (np.uint64(res) << np.uint64(55))
        | (face.astype(np.uint64) << np.uint64(50))
        | ((q + _OFF).astype(np.uint64) << np.uint64(25))
        | (r + _OFF).astype(np.uint64)
    )
    return cid


def unpack(cid: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    cid = np.asarray(cid, dtype=np.uint64)
    res = ((cid >> np.uint64(55)) & np.uint64(0xF)).astype(np.int64)
    face = ((cid >> np.uint64(50)) & np.uint64(0x1F)).astype(np.int64)
    q = ((cid >> np.uint64(25)) & np.uint64(0x1FFFFFF)).astype(np.int64) - _OFF
    r = (cid & np.uint64(0x1FFFFFF)).astype(np.int64) - _OFF
    return face, q, r, res


def cell_res(cid: np.ndarray) -> np.ndarray:
    return ((np.asarray(cid, dtype=np.uint64) >> np.uint64(55)) & np.uint64(0xF)).astype(np.int64)


def cell_to_lonlat(cid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell id → center lon/lat degrees (inverse of lonlat_to_cell)."""
    face, q, r, res = unpack(cid)
    size = _res_size(res)
    rx = size * (np.sqrt(3.0) * q + np.sqrt(3.0) / 2.0 * r)
    ry = size * (1.5 * r)
    th = res * _ALPHA
    c, s = np.cos(th), np.sin(th)
    fx = c * rx - s * ry
    fy = s * rx + c * ry
    n = _FC[face]
    p = n + fx[:, None] * _EX[face] + fy[:, None] * _EY[face]
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    return np.rad2deg(np.arctan2(p[:, 1], p[:, 0])), np.rad2deg(np.arcsin(np.clip(p[:, 2], -1, 1)))


def cell_to_parent(cid: np.ndarray, parent_res: int) -> np.ndarray:
    """Parent by center-chaining: the parent is the ``parent_res`` cell
    containing this cell's center (see module docstring deviation note)."""
    lon, lat = cell_to_lonlat(cid)
    return lonlat_to_cell(lon, lat, parent_res)


_AXIAL_NB = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64)


def neighbors(cid: np.ndarray) -> np.ndarray:
    """6 hex neighbors per cell, (N, 6) — cross-face handled by
    re-encoding each neighbor's center point on the sphere."""
    face, q, r, res = unpack(cid)
    res0 = int(res[0]) if len(np.atleast_1d(res)) else 0
    out = np.empty((len(cid), 6), dtype=np.uint64)
    for k, (dq, dr) in enumerate(_AXIAL_NB):
        nq, nr = q + dq, r + dr
        cand = pack(face, nq, nr, res0)
        lon, lat = cell_to_lonlat(cand)
        out[:, k] = lonlat_to_cell(lon, lat, res0)
    return out


def grid_disk(cid: int, k: int) -> np.ndarray:
    """All cells within k hex steps (BFS over ``neighbors``) — the
    kNN cell-ring expansion primitive (SURVEY.md §2.4 J6)."""
    seen = {int(cid)}
    frontier = np.array([cid], dtype=np.uint64)
    for _ in range(k):
        nb = neighbors(frontier).ravel()
        new = np.array([c for c in np.unique(nb) if int(c) not in seen], dtype=np.uint64)
        for c in new:
            seen.add(int(c))
        frontier = new
        if len(frontier) == 0:
            break
    return np.array(sorted(seen), dtype=np.uint64)


def cover_bbox(min_lon: float, min_lat: float, max_lon: float, max_lat: float,
               res: int, max_cells: int | None = None) -> np.ndarray:
    """Deterministic lattice covering of a lon/lat bbox (same
    construction and join-key guarantee as s2.cover_bbox: both sides of
    a join must use one fixed ``res``; ``max_cells`` coarsening is for
    pruning use only)."""
    while True:
        # hex spacing in degrees ≈ rad→deg of arc at this res
        delta = np.rad2deg(_D0 * 7.0 ** (-res / 2.0)) / 2.0
        lon0 = np.floor((min_lon - delta) / delta) * delta
        lat0 = np.floor((max(min_lat, -89.99) - delta) / delta) * delta
        nlon = int(np.ceil((max_lon + delta - lon0) / delta)) + 1
        nlat = int(np.ceil((min(max_lat, 89.99) + delta - lat0) / delta)) + 1
        if max_cells is None or nlon * nlat <= max_cells or res == 0:
            break
        res -= 1
    lons = lon0 + delta * np.arange(nlon)
    lats = np.clip(lat0 + delta * np.arange(nlat), -89.999, 89.999)
    glon, glat = np.meshgrid(lons, lats)
    return np.unique(lonlat_to_cell(glon.ravel(), glat.ravel(), res))
