"""General (concave/holed) polygon intersection area — VERDICT r1 #3.

Oracles: hand-computed areas for L-shape/star cases, plus an
independent triangulate-BOTH-sides reference (convex-triangle ×
convex-triangle SH only — no concave SH anywhere) and Monte-Carlo
cross-checks. Ends with the reference-parity catchment query over a
CONCAVE catchment fixture."""

import numpy as np
import pytest

from hand_index_ray.kernels import geom, proj, wkb


def _poly(rings_per_part):
    return wkb.from_parts([rings_per_part])


def _tri_both_area(a, ai, b, bi):
    """Independent oracle: triangulate every ring of BOTH sides; sum
    signed convex-tri × convex-tri SH areas."""
    total = 0.0
    ga, gb = a.geom_slice(ai), b.geom_slice(bi)
    for pa_ in range(len(ga.part_ring_off) - 1):
        r0, r1 = ga.part_ring_off[pa_], ga.part_ring_off[pa_ + 1]
        for ri in range(r0, r1):
            s0, s1 = ga.ring_coord_off[ri], ga.ring_coord_off[ri + 1]
            tris_a = geom.triangulate_ring(ga.coords[s0:s1])
            sa = 1.0 if ri == r0 else -1.0
            for pb in range(len(gb.part_ring_off) - 1):
                q0, q1 = gb.part_ring_off[pb], gb.part_ring_off[pb + 1]
                for rj in range(q0, q1):
                    t0, t1 = gb.ring_coord_off[rj], gb.ring_coord_off[rj + 1]
                    tris_b = geom.triangulate_ring(gb.coords[t0:t1])
                    sb = 1.0 if rj == q0 else -1.0
                    for ta in tris_a:
                        for tb in tris_b:
                            total += sa * sb * geom._ring_area_abs(
                                geom._sh_clip(ta, tb))
    return max(total, 0.0)


L_SHAPE = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4], [0, 0]], float)


def test_triangulate_l_shape():
    tris = geom.triangulate_ring(L_SHAPE)
    assert len(tris) == 4  # 6 vertices → n-2 triangles
    area = sum(geom._ring_area_abs(np.vstack([t, t[:1]])) for t in tris)
    assert area == pytest.approx(7.0)  # 4+4-1


def test_concave_clip_l_shape_vs_rect():
    l = _poly([[L_SHAPE]])
    # rect covering the notch corner: [0.5,3.5]x[0.5,3.5]
    r = np.array([[0.5, 0.5], [3.5, 0.5], [3.5, 3.5], [0.5, 3.5], [0.5, 0.5]])
    rect = _poly([[r]])
    # L ∩ rect: vertical arm [0.5,1]x[0.5,3.5] = 1.5 ; horizontal arm
    # [1,3.5]x[0.5,1] = 1.25 → 2.75
    want = 2.75
    assert geom.clip_area_general(rect, 0, l, 0) == pytest.approx(want)
    assert geom.clip_area_general(l, 0, rect, 0) == pytest.approx(want)
    assert _tri_both_area(rect, 0, l, 0) == pytest.approx(want)


def test_concave_clip_disconnected_intersection():
    """U-shape ∩ bar = TWO disjoint rectangles — the case where naive
    concave SH produces a degenerate joined polygon; area must still be
    exact."""
    u = np.array([[0, 0], [5, 0], [5, 3], [4, 3], [4, 1], [1, 1], [1, 3], [0, 3], [0, 0]], float)
    bar = np.array([[-1, 2], [6, 2], [6, 4], [-1, 4], [-1, 2]], float)
    up = _poly([[u]])
    bp = _poly([[bar]])
    want = 2.0  # two 1x1 squares: [0,1]x[2,3] and [4,5]x[2,3]
    assert geom.clip_area_general(bp, 0, up, 0) == pytest.approx(want)
    assert geom.clip_area_general(up, 0, bp, 0) == pytest.approx(want)


def test_clip_with_holes_both_sides():
    # 10x10 square with 4x4 hole vs 6x6 square with 2x2 hole, offset
    outer_a = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole_a = np.array([[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]], float)
    outer_b = np.array([[2, 2], [8, 2], [8, 8], [2, 8], [2, 2]], float)
    hole_b = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)
    a = _poly([[outer_a, hole_a]])
    b = _poly([[outer_b, hole_b]])
    got = geom.clip_area_general(a, 0, b, 0)
    want = _tri_both_area(a, 0, b, 0)
    assert got == pytest.approx(want)
    # closed form: B∩A = 6x6 minus (hole_a ∩ outer_b = 4x4=16) minus
    # (hole_b ∩ A-part already inside hole_a → hole_b ⊂ hole_a: 0 extra)
    assert got == pytest.approx(36 - 16)


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_concave_star_vs_rotated_star_montecarlo(seed):
    rng = np.random.default_rng(seed)
    m = 10
    ang = np.linspace(0, 2 * np.pi, m, endpoint=False)
    r1 = np.where(np.arange(m) % 2 == 0, 2.0, 0.8 + rng.uniform(0, 0.4))
    star1 = np.stack([r1 * np.cos(ang), r1 * np.sin(ang)], axis=1)
    r2 = np.where(np.arange(m) % 2 == 0, 1.8, 0.7 + rng.uniform(0, 0.4))
    off = rng.uniform(-0.5, 0.5, 2)
    star2 = np.stack([r2 * np.cos(ang + 0.3) + off[0],
                      r2 * np.sin(ang + 0.3) + off[1]], axis=1)
    p1, p2 = _poly([[star1]]), _poly([[star2]])
    got = geom.clip_area_general(p1, 0, p2, 0)
    ref = _tri_both_area(p1, 0, p2, 0)
    assert got == pytest.approx(ref, rel=1e-9)
    # Monte-Carlo sanity (loose tolerance)
    n = 200_000
    px = rng.uniform(-2.2, 2.2, n)
    py = rng.uniform(-2.2, 2.2, n)
    in1 = geom.points_in_geom(px, py, p1)
    in2 = geom.points_in_geom(px, py, p2)
    mc = (in1 & in2).mean() * 4.4 * 4.4
    assert got == pytest.approx(mc, rel=0.05)


def test_roi_query_catchments_concave_fixture(ray_session, tmp_path):
    """Reference keep-mask semantics (query_geojson.py:187-219) on
    CONCAVE catchments — the case the r1 convex-only clip got wrong by
    construction. Oracle: pure-python triangulate-both areas + the same
    NA rule."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hand_index_ray.config import EngineConfig
    from hand_index_ray.pipelines.query import roi_query_catchments

    rng = np.random.default_rng(7)
    n = 40
    geoms, cids = [], []
    for k in range(n):
        cx = rng.uniform(-110, -90)
        cy = rng.uniform(30, 42)
        m = 12
        ang = np.linspace(0, 2 * np.pi, m, endpoint=False)
        rad = np.where(np.arange(m) % 2 == 0, rng.uniform(0.3, 0.5), rng.uniform(0.08, 0.15))
        ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        x, y = proj.lonlat_to_albers(ring[:, 0], ring[:, 1])
        geoms.append([[np.stack([x, y], axis=1)]])
        cids.append(str(uuid.uuid5(uuid.NAMESPACE_URL, f"concave-{k}")))
    rag = wkb.from_parts(geoms)
    blobs = wkb.encode(rag)
    path = os.path.join(str(tmp_path), "concave_catchments.parquet")
    pq.write_table(pa.table({
        "catchment_id": pa.array(cids, pa.string()),
        "geometry": pa.array([b for b in blobs], pa.binary()),
    }), path)

    ring4326 = np.array([[-103.0, 33.0], [-96.5, 33.5], [-96.0, 39.0], [-102.5, 38.5]])
    thr = 30.0
    got = roi_query_catchments(path, ring4326, threshold_pct=thr,
                               cfg=EngineConfig()).to_pandas()

    # oracle: same projection, triangulate-both intersection areas
    rx, ry = proj.lonlat_to_albers(ring4326[:, 0], ring4326[:, 1])
    roi = wkb.from_parts([[[np.stack([rx, ry], axis=1)]]])
    areas = geom.area(rag)
    keep_ids, pcts = [], {}
    for i in range(n):
        inter = _tri_both_area(roi, 0, rag, i)
        if not geom.geom_intersects(rag, i, roi, 0):
            continue
        pct = 0.0 if areas[i] == 0 else inter / areas[i] * 100.0
        contains = geom.geom_contains(rag, i, roi, 0)
        within = geom.geom_contains(roi, 0, rag, i)
        if contains or within or pct >= thr:
            keep_ids.append(cids[i])
            pcts[cids[i]] = pct
    assert set(got["catchment_id"]) == set(keep_ids)
    for cid, pct in pcts.items():
        row = got[got["catchment_id"] == cid]
        assert row["overlap_pct"].iloc[0] == pytest.approx(pct, rel=1e-9)
