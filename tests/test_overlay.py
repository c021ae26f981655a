"""Polygon layer overlay: exactly-once pair emission across cells and
exact areas (rect brute force + a concave L-shape case)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from hand_index_ray.kernels import wkb as kwkb
from hand_index_ray.pipelines.overlay import overlay_intersection_areas


def _rect_wkb(x0, y0, x1, y1):
    ring = np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)],
                    np.float64)
    return kwkb.encode(kwkb.from_parts([[[ring]]]))[0]


def _layer(rows):
    return ray.data.from_arrow(pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "wkb": pa.array([r[1] for r in rows], pa.binary())}))


def test_overlay_rects_exactly_once_small_cells(ray_session):
    rng = np.random.default_rng(2)
    A = [(i, tuple(sorted(rng.integers(0, 40, 2))) +
             tuple(sorted(rng.integers(0, 40, 2)))) for i in range(12)]
    # re-draw until non-degenerate
    A = []
    for i in range(12):
        x0, x1 = sorted(rng.integers(0, 35, 2))
        y0, y1 = sorted(rng.integers(0, 35, 2))
        A.append((i, (x0, y0, x1 + 3, y1 + 3)))
    B = []
    for i in range(10):
        x0, x1 = sorted(rng.integers(0, 35, 2))
        y0, y1 = sorted(rng.integers(0, 35, 2))
        B.append((100 + i, (x0, y0, x1 + 4, y1 + 4)))
    la = _layer([(i, _rect_wkb(*bb)) for i, bb in A])
    lb = _layer([(i, _rect_wkb(*bb)) for i, bb in B])
    # cell=5 forces every rect to span MANY cells: the exactly-once
    # canonical-cell rule is what keeps each pair single
    got = overlay_intersection_areas(la, lb, cell=5.0, num_buckets=8) \
        .to_pandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
    exp_rows = []
    for i, (ax0, ay0, ax1, ay1) in A:
        for j, (bx0, by0, bx1, by1) in B:
            w = min(ax1, bx1) - max(ax0, bx0)
            h = min(ay1, by1) - max(ay0, by0)
            if w > 0 and h > 0:
                exp_rows.append((i, j, float(w * h)))
    exp = pd.DataFrame(exp_rows, columns=["a_id", "b_id", "area"])
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got.astype({"a_id": "int64", "b_id": "int64"}), exp)


def test_overlay_concave_l_shape(ray_session):
    # L-shape = [0,10]x[0,4] ∪ [0,4]x[0,10]; clip rect [2,8]x[2,8]
    l_ring = np.array([(0, 0), (10, 0), (10, 4), (4, 4), (4, 10),
                       (0, 10), (0, 0)], np.float64)
    la = _layer([(1, kwkb.encode(kwkb.from_parts([[[l_ring]]]))[0])])
    lb = _layer([(2, _rect_wkb(2, 2, 8, 8))])
    got = overlay_intersection_areas(la, lb, cell=4.0, num_buckets=4) \
        .to_pandas()
    # ∩ = [2,8]x[2,4] (12) ∪ [2,4]x[4,8] (8) = 20
    assert len(got) == 1
    assert got["a_id"].iloc[0] == 1 and got["b_id"].iloc[0] == 2
    assert abs(got["area"].iloc[0] - 20.0) < 1e-9


def _brute_crossings(A, B):
    out = []
    for ai, ax1, ay1, ax2, ay2 in A:
        for bi, bx1, by1, bx2, by2 in B:
            d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
            d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
            d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
            d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
            if d1 * d2 < 0 and d3 * d4 < 0:
                out.append((ai, bi))
    return sorted(out)


def test_segment_crossings_brute_parity(ray_session):
    from hand_index_ray.pipelines.overlay import segment_crossings

    rng = np.random.default_rng(67)
    for cs in (4, 16, 64):
        A = [(i, *(int(v) for v in rng.integers(-30, 70, 4)))
             for i in range(40)]
        B = [(i, *(int(v) for v in rng.integers(-30, 70, 4)))
             for i in range(100, 140)]
        da = ray.data.from_pandas(pd.DataFrame(
            A, columns=["id", "x1", "y1", "x2", "y2"]))
        db = ray.data.from_pandas(pd.DataFrame(
            B, columns=["id", "x1", "y1", "x2", "y2"]))
        got = segment_crossings(da, db, cs=cs).to_pandas()
        got_pairs = sorted(zip(got["a_id"], got["b_id"]))
        assert got_pairs == _brute_crossings(A, B), cs
        # exactly-once: no duplicate pair rows
        assert len(got_pairs) == len(set(got_pairs))


def test_segment_crossings_touch_excluded(ray_session):
    from hand_index_ray.pipelines.overlay import segment_crossings

    # T-touch (endpoint on interior), shared endpoint, collinear
    # overlap: none are PROPER crossings against A0.  B10 T-touches A0
    # at (5,0) but ALSO properly crosses A1 at (5,5); B13 properly
    # crosses A1 at (5,5).
    A = [(0, 0, 0, 10, 0),    # horizontal y=0
         (1, 0, 5, 10, 5)]    # horizontal y=5
    B = [(10, 5, 0, 5, 10),   # vertical: T-touch on A0, proper X on A1
         (11, 0, 0, 0, 10),   # shares endpoint with A0
         (12, 2, 0, 8, 0),    # collinear inside A0
         (13, 3, 4, 7, 6)]    # properly crosses A1
    da = ray.data.from_pandas(pd.DataFrame(
        A, columns=["id", "x1", "y1", "x2", "y2"]))
    db = ray.data.from_pandas(pd.DataFrame(
        B, columns=["id", "x1", "y1", "x2", "y2"]))
    got = segment_crossings(da, db, cs=8).to_pandas()
    assert sorted(zip(got["a_id"], got["b_id"])) == [(1, 10), (1, 13)]
    # nothing pairs with A0: every B contact with A0 is touch/collinear
    assert 0 not in set(got["a_id"])
