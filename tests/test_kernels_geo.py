"""Unit tests: projection, WKB codec, geometry kernels (no Ray needed)."""

import numpy as np
import pytest

from hand_index_ray.kernels import geom, proj, wkb


def test_proj_origin_and_roundtrip():
    x, y = proj.lonlat_to_albers(np.array([-96.0]), np.array([23.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    rng = np.random.default_rng(42)
    lon = rng.uniform(-125, -66, 500)
    lat = rng.uniform(24, 50, 500)
    X, Y = proj.lonlat_to_albers(lon, lat)
    lon2, lat2 = proj.albers_to_lonlat(X, Y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_proj_scale_on_standard_parallel():
    # scale factor along a standard parallel must be ~1
    x1, _ = proj.lonlat_to_albers(np.array([-96.0]), np.array([29.5]))
    x2, _ = proj.lonlat_to_albers(np.array([-95.9]), np.array([29.5]))
    a, f = 6378137.0, 1 / 298.257222101
    e2 = 2 * f - f * f
    phi = np.deg2rad(29.5)
    arc = a * np.cos(phi) / np.sqrt(1 - e2 * np.sin(phi) ** 2) * np.deg2rad(0.1)
    assert abs((x2[0] - x1[0]) / arc - 1.0) < 1e-5


def _square(cx, cy, half):
    return np.array(
        [[cx - half, cy - half], [cx + half, cy - half], [cx + half, cy + half],
         [cx - half, cy + half], [cx - half, cy - half]]
    )


def test_wkb_roundtrip_polygon_multipolygon():
    sq = _square(0, 0, 1)
    hole = _square(0, 0, 0.25)[::-1]  # CW hole
    r = wkb.from_parts([
        [[sq, hole]],                     # polygon with hole
        [[sq + 10], [_square(20, 20, 2)]],  # multipolygon, 2 parts
    ])
    blobs = wkb.encode(r)
    assert blobs[0][1:5] == (3).to_bytes(4, "little")
    assert blobs[1][1:5] == (6).to_bytes(4, "little")
    r2 = wkb.decode(blobs)
    np.testing.assert_allclose(r2.coords, r.coords)
    np.testing.assert_array_equal(r2.ring_coord_off, r.ring_coord_off)
    np.testing.assert_array_equal(r2.part_ring_off, r.part_ring_off)
    np.testing.assert_array_equal(r2.geom_part_off, r.geom_part_off)


def test_wkb_big_endian_decode():
    import struct
    sq = _square(0, 0, 1)
    buf = struct.pack(">BII", 0, 3, 1) + struct.pack(">I", 5) + sq.astype(">f8").tobytes()
    r = wkb.decode([buf])
    np.testing.assert_allclose(r.coords, sq)


def test_wkb_encode_box_matches_generic():
    blobs = wkb.encode_box(np.array([0.0]), np.array([1.0]), np.array([2.0]), np.array([4.0]))
    r = wkb.decode(blobs)
    assert geom.area(r)[0] == pytest.approx(2 * 3)
    b = geom.bounds(r)[0]
    np.testing.assert_allclose(b, [0, 1, 2, 4])


def test_area_with_hole_and_multi():
    sq = _square(0, 0, 1)          # area 4
    hole = _square(0, 0, 0.25)     # area 0.25
    r = wkb.from_parts([
        [[sq, hole]],
        [[sq], [sq + 10]],
    ])
    a = geom.area(r)
    assert a[0] == pytest.approx(4 - 0.25)
    assert a[1] == pytest.approx(8)


def test_centroid():
    r = wkb.from_parts([[[_square(3, 7, 2)]]])
    cx, cy = geom.centroid(r)
    assert cx[0] == pytest.approx(3) and cy[0] == pytest.approx(7)
    # degenerate zero-area polygon → vertex mean fallback
    line = np.array([[0, 0], [2, 0], [0, 0]])
    rd = wkb.from_parts([[[line]]])
    cx, cy = geom.centroid(rd)
    assert np.isfinite(cx[0]) and np.isfinite(cy[0])


def test_points_in_geom_with_hole():
    sq = _square(0, 0, 1)
    hole = _square(0, 0, 0.25)[::-1]
    r = wkb.from_parts([[[sq, hole]]])
    px = np.array([0.0, 0.5, 2.0, 0.1])
    py = np.array([0.0, 0.5, 0.0, 0.0])
    inside = geom.points_in_geom(px, py, r)
    # (0,0) is in the hole; (0.5,0.5) inside; (2,0) outside; (0.1,0) in hole
    assert list(inside) == [False, True, False, False]


def test_intersects_and_contains():
    a = wkb.from_parts([[[_square(0, 0, 2)]]])
    b = wkb.from_parts([[[_square(1, 1, 2)]]])   # overlaps a
    c = wkb.from_parts([[[_square(10, 10, 1)]]])  # disjoint
    d = wkb.from_parts([[[_square(0, 0, 0.5)]]])  # inside a
    # cross shape: edges cross but no vertex containment
    horiz = np.array([[-3, -0.1], [3, -0.1], [3, 0.1], [-3, 0.1], [-3, -0.1]])
    vert = np.array([[-0.1, -3], [0.1, -3], [0.1, 3], [-0.1, 3], [-0.1, -3]])
    h = wkb.from_parts([[[horiz]]])
    v = wkb.from_parts([[[vert]]])
    assert geom.geom_intersects(a, 0, b, 0)
    assert not geom.geom_intersects(a, 0, c, 0)
    assert geom.geom_intersects(a, 0, d, 0)
    assert geom.geom_intersects(h, 0, v, 0)
    assert geom.geom_contains(a, 0, d, 0)
    assert not geom.geom_contains(d, 0, a, 0)
    assert not geom.geom_contains(a, 0, b, 0)


def test_clip_area_rect_and_convex():
    a = wkb.from_parts([[[_square(0, 0, 1)]]])
    b = wkb.from_parts([[[_square(1, 1, 1)]]])
    assert geom.clip_area(a, 0, b, 0) == pytest.approx(1.0)  # unit overlap corner
    # subject with hole clipped by big square = subject area
    hole = _square(0, 0, 0.25)[::-1]
    s = wkb.from_parts([[[_square(0, 0, 1), hole]]])
    big = wkb.from_parts([[[_square(0, 0, 10)]]])
    assert geom.clip_area(s, 0, big, 0) == pytest.approx(4 - 0.25)
    # vectorized rect x rect agrees
    va = geom.box_clip_area(np.array([-1.0]), np.array([-1.0]), np.array([1.0]), np.array([1.0]),
                            np.array([0.0]), np.array([0.0]), np.array([2.0]), np.array([2.0]))
    assert va[0] == pytest.approx(1.0)
    # triangle clip (convex, non-rect)
    tri = np.array([[0, 0], [4, 0], [0, 4], [0, 0]])
    t = wkb.from_parts([[[tri]]])
    sq = wkb.from_parts([[[_square(1, 1, 1)]]])
    # square [0,2]x[0,2] ∩ triangle x+y<=4 → area 4 - 0 = 4? corner (2,2) on line x+y=4 → full square inside
    assert geom.clip_area(sq, 0, t, 0) == pytest.approx(4.0)
    sq2 = wkb.from_parts([[[_square(2, 2, 1)]]])
    # square [1,3]^2 ∩ triangle: half of it (cut along x+y=4)
    assert geom.clip_area(sq2, 0, t, 0) == pytest.approx(2.0)


def test_overlap_stats_na_rule():
    areas = np.array([4.0, 0.0, 2.0])
    inter = np.array([1.0, 0.0, 2.0])
    pct = geom.overlap_stats(areas, inter)
    np.testing.assert_allclose(pct, [25.0, 0.0, 100.0])
    mask = geom.keep_mask(np.array([False, True, False]), np.zeros(3, bool), pct, 50.0)
    assert list(mask) == [False, True, True]


def test_douglas_peucker():
    # a square with redundant collinear midpoints
    ring = np.array([[0, 0], [1, 0], [2, 0], [2, 1], [2, 2], [0, 2], [0, 0]], dtype=float)
    out = geom.douglas_peucker(ring, 0.01)
    assert len(out) == 5  # 4 corners + closure
    r = wkb.from_parts([[[ring]]])
    rs = geom.simplify(r, 0.01)
    assert geom.area(rs)[0] == pytest.approx(geom.area(r)[0])


def test_axis_rect_detection_and_fast_path():
    import numpy as np

    from hand_index_ray.kernels import geom, wkb

    ring = np.array([[-106.3, 31.4], [-95.7, 31.4], [-95.7, 40.6], [-106.3, 40.6]])
    prep = geom.PreparedPolygon(wkb.from_parts([[[ring]]]))
    rect = geom.axis_rect(prep)
    assert rect == (-106.3, 31.4, -95.7, 40.6)
    # not axis-aligned → None
    slanted = np.array([[0, 0], [2, 0.1], [2, 2], [0, 1.9]])
    assert geom.axis_rect(geom.PreparedPolygon(wkb.from_parts([[[slanted]]]))) is None
    # pentagon → None
    ang = np.linspace(0, 2 * np.pi, 5, endpoint=False)
    penta = np.stack([np.cos(ang), np.sin(ang)], axis=1)
    assert geom.axis_rect(geom.PreparedPolygon(wkb.from_parts([[[penta]]]))) is None
    # fast path agrees with the general predicate on random rects
    rng = np.random.default_rng(3)
    minx = rng.uniform(-110, -95, 200)
    miny = rng.uniform(30, 40, 200)
    maxx = minx + rng.uniform(0.01, 3, 200)
    maxy = miny + rng.uniform(0.01, 3, 200)
    fast = geom.rects_vs_rect(minx, miny, maxx, maxy, *rect)
    slow = geom.rects_vs_polygon(minx, miny, maxx, maxy, prep)
    assert (fast["intersects"] == slow["intersects"]).all()
    assert (fast["rect_within_poly"] == slow["rect_within_poly"]).all()
    assert (fast["rect_contains_poly"] == slow["rect_contains_poly"]).all()
    import numpy.testing as npt
    npt.assert_allclose(fast["inter_area"], slow["inter_area"], rtol=1e-9)


def test_triangulate_degenerate_and_convex():
    import numpy as np

    from hand_index_ray.kernels import geom

    # convex ring → n-2 triangles, full area
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
    tris = geom.triangulate_ring(sq)
    assert len(tris) == 2
    # triangle passthrough
    t = geom.triangulate_ring(np.array([[0, 0], [1, 0], [0, 1]], float))
    assert len(t) == 1
    # collinear degenerate: no crash, zero-ish area
    line = np.array([[0, 0], [1, 0], [2, 0], [3, 0]], float)
    tris = geom.triangulate_ring(line)
    total = sum(geom._ring_area_abs(np.vstack([x, x[:1]])) for x in tris)
    assert total == 0.0


def test_polygons_intersect_one_matches_pairwise():
    """The batch ST_Intersects kernel must reproduce per-candidate
    geom_intersects exactly on a varied polygon set: disjoint,
    vertex-inside, containing-the-query, edge-cross-only, concave and
    holed cases."""
    import numpy as np

    from hand_index_ray.kernels import geom, wkb

    rng = np.random.default_rng(7)
    # query polygon: a concave "L" shape
    roi = wkb.from_parts([[[np.array(
        [[0, 0], [4, 0], [4, 1.5], [1.5, 1.5], [1.5, 4], [0, 4], [0, 0]],
        float)]]])
    prep = geom.PreparedPolygon(roi, 0)

    geoms = []
    # random small squares scattered around (mixed in/out)
    for _ in range(60):
        cx, cy = rng.uniform(-2, 6, 2)
        s = rng.uniform(0.2, 1.2)
        geoms.append([[np.array([[cx, cy], [cx + s, cy], [cx + s, cy + s],
                                 [cx, cy + s], [cx, cy]], float)]])
    # a huge square containing the ROI entirely (no ROI vertex strictly
    # inside test passes via query-vertex-in-candidate)
    geoms.append([[np.array([[-10, -10], [10, -10], [10, 10], [-10, 10],
                             [-10, -10]], float)]])
    # an edge-cross-only sliver through the L's notch
    geoms.append([[np.array([[2, -1], [2.2, -1], [2.2, 5], [2, 5], [2, -1]],
                            float)]])
    # a holed polygon whose hole swallows part of the ROI corner
    geoms.append([[np.array([[-1, -1], [2, -1], [2, 2], [-1, 2], [-1, -1]],
                            float),
                   np.array([[-0.5, -0.5], [1, -0.5], [1, 1], [-0.5, 1],
                             [-0.5, -0.5]], float)]])
    rag = wkb.from_parts(geoms)
    n = len(rag)

    gb = geom.bounds(rag)
    rb = prep.bounds
    cand = (gb[:, 0] <= rb[2]) & (rb[0] <= gb[:, 2]) & \
           (gb[:, 1] <= rb[3]) & (rb[1] <= gb[:, 3])
    got = geom.polygons_intersect_one(rag, cand, prep)
    want = np.array([bool(cand[i]) and
                     geom.geom_intersects(rag, i, roi, 0)
                     for i in range(n)])
    assert (got == want).all(), np.nonzero(got != want)


def test_zonal_broadcast_joiner_unpickles_once_per_catchment():
    """Per-actor PreparedPolygon cache: repeated batches touching the
    same catchments must not re-materialize the prepared views (one
    construction per catchment per actor), and the packed catalog's
    view-based polygons must give the same predicate results as
    directly-prepared ones."""
    import numpy as np
    import pyarrow as pa
    import ray

    from hand_index_ray.kernels import geom, wkb
    from hand_index_ray.pipelines.query import (ZonalBroadcastJoiner,
                                                _pack_catalog)
    from hand_index_ray.pipelines.query import lattice_cover

    level = 7
    # two catchment squares in ONE multi-geometry catalog ragged
    rings = []
    polys = []
    for x0 in (0.0, 2.0):
        ring = np.array(
            [[x0, 0], [x0 + 1.5, 0], [x0 + 1.5, 1.5], [x0, 1.5], [x0, 0]],
            float)
        rings.append([[ring]])
        polys.append(wkb.from_parts([[[ring]]]))
    rag_all = wkb.from_parts(rings)
    packed = _pack_catalog(rag_all)
    # packed views must reproduce the directly-prepared edge arrays
    for i, p in enumerate(polys):
        ref = geom.PreparedPolygon(p, 0)
        s, e = packed["edge_off"][i], packed["edge_off"][i + 1]
        assert np.array_equal(packed["e1"][s:e], ref.e1)
        assert np.array_equal(packed["e2"][s:e], ref.e2)
        assert np.allclose(packed["bounds"][i], ref.bounds)
        assert np.isclose(packed["area"][i], ref.area)
    bb = np.stack([geom.bounds(p)[0] for p in polys])
    ci, cc = lattice_cover(bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3], level)
    o = np.argsort(cc, kind="stable")
    cc_s, ci_s = cc[o], ci[o].astype(np.int64)
    ucell, ustart = np.unique(cc_s, return_index=True)
    uoff = np.append(ustart, len(cc_s)).astype(np.int64)
    idx_ref = ray.put((ucell, uoff, ci_s,
                       np.array(["c0", "c1"], dtype=object), packed))

    j = ZonalBroadcastJoiner(idx_ref, level)
    batch = pa.table({"image_id": pa.array(["a", "b"], pa.string()),
                      "minx": pa.array([0.1, 2.1]),
                      "miny": pa.array([0.1, 0.1]),
                      "maxx": pa.array([0.4, 2.4]),
                      "maxy": pa.array([0.4, 0.4])})
    out1 = j(batch)
    out2 = j(batch)  # same catchments again — must hit the cache
    out3 = j(batch)
    assert out1.num_rows == 2 and out2.num_rows == 2 and out3.num_rows == 2
    assert j.n_unpickles == 2  # one per catchment, not per batch


def test_snap_to_segments_int_brute():
    from hand_index_ray.kernels.geom import snap_to_segments_int

    rng = np.random.default_rng(5)
    segs = rng.integers(0, 500, (12, 4)).astype(np.int64)
    segs[3, 2:] = segs[3, :2]  # degenerate point-segment
    px = rng.integers(0, 500, 300).astype(np.int64)
    py = rng.integers(0, 500, 300).astype(np.int64)
    idx, num, den = snap_to_segments_int(px, py, segs)

    # float brute force
    for j in range(len(px)):
        best = None
        for i, (x1, y1, x2, y2) in enumerate(segs):
            abx, aby = x2 - x1, y2 - y1
            L2 = abx * abx + aby * aby
            if L2 == 0:
                d2 = (px[j] - x1) ** 2 + (py[j] - y1) ** 2
            else:
                t = ((px[j] - x1) * abx + (py[j] - y1) * aby) / L2
                t = min(1.0, max(0.0, t))
                cx, cy = x1 + t * abx, y1 + t * aby
                d2 = (px[j] - cx) ** 2 + (py[j] - cy) ** 2
            if best is None or d2 < best[1] - 1e-9:
                best = (i, d2)
        assert idx[j] == best[0]
        assert abs(num[j] / den[j] - best[1]) < 1e-6


def test_idw_exact_matches_float_idw():
    from hand_index_ray.kernels.geom import idw_exact

    rng = np.random.default_rng(8)
    sites = rng.integers(0, 30, (5, 2)) * 2  # even coords
    vals = rng.integers(10, 250, 5)
    px = rng.integers(0, 30, 50) * 2 + 1  # odd -> never on a site
    py = rng.integers(0, 30, 50) * 2 + 1
    num, den = idw_exact(px, py, sites, vals)
    for i in range(50):
        d2 = ((px[i] - sites[:, 0]) ** 2
              + (py[i] - sites[:, 1]) ** 2).astype(np.float64)
        exp = (vals / d2).sum() / (1.0 / d2).sum()
        assert abs(num[i] / den[i] - exp) < 1e-9
    with pytest.raises(ValueError):
        idw_exact(np.array([sites[0, 0]]), np.array([sites[0, 1]]),
                  sites, vals)
