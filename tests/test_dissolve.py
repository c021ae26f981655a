"""dissolve_union: ST_Union_Agg parity on tessellated meshes
(reference load.py:153) — shared-edge cancellation + ring stitching."""

import numpy as np
import pytest

from hand_index_ray.kernels import geom, wkb


def _sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


def test_two_squares_sharing_an_edge():
    r = wkb.from_parts([[[_sq(0, 0, 1, 1)]], [[_sq(1, 0, 2, 1)]]])
    out = geom.dissolve_union(r)
    assert len(out) == 1
    assert out.num_parts() == 1
    assert geom.area(out)[0] == pytest.approx(2.0)
    b = geom.bounds(out)[0]
    assert tuple(b) == (0.0, 0.0, 2.0, 1.0)
    # interior edge is gone: 6 boundary vertices max (4 corners + 2 mid)
    assert len(out.coords) <= 7  # closed ring repeats the first vertex


def test_quadrant_mesh_dissolves_to_one_square():
    quads = [_sq(0, 0, 1, 1), _sq(1, 0, 2, 1), _sq(0, 1, 1, 2), _sq(1, 1, 2, 2)]
    r = wkb.from_parts([[[q]] for q in quads])
    out = geom.dissolve_union(r)
    assert geom.area(out)[0] == pytest.approx(4.0)
    assert out.num_parts() == 1
    assert tuple(geom.bounds(out)[0]) == (0.0, 0.0, 2.0, 2.0)


def test_ring_mesh_dissolves_to_square_with_hole():
    """Four frame pieces around an empty center → one part with one
    hole. Shared edges are subdivided identically on both sides (the
    dissolve contract — a common tessellation's vertices coincide)."""
    frames = [
        # bottom bar, top edge subdivided at x=1,2
        np.array([[0, 0], [3, 0], [3, 1], [2, 1], [1, 1], [0, 1], [0, 0]], float),
        # top bar, bottom edge subdivided at x=1,2
        np.array([[0, 2], [1, 2], [2, 2], [3, 2], [3, 3], [0, 3], [0, 2]], float),
        _sq(0, 1, 1, 2),            # left bar
        _sq(2, 1, 3, 2),            # right bar
    ]
    r = wkb.from_parts([[[f]] for f in frames])
    out = geom.dissolve_union(r)
    assert len(out) == 1
    assert out.num_parts() == 1
    nrings = len(out.ring_coord_off) - 1
    assert nrings == 2  # shell + hole
    assert geom.area(out)[0] == pytest.approx(9.0 - 1.0)


def test_disjoint_parts_pass_through():
    r = wkb.from_parts([[[_sq(0, 0, 1, 1)]], [[_sq(5, 5, 6, 6)]]])
    out = geom.dissolve_union(r)
    assert out.num_parts() == 2
    assert geom.area(out)[0] == pytest.approx(2.0)


def test_mesh_with_subdivided_shared_edge():
    """Shared boundary split at different points on one side: snapping
    grid aligns identical coords; edges cancel only when both sides
    carry the same vertices — here they do (common tessellation)."""
    left = np.array([[0, 0], [1, 0], [1, 0.5], [1, 1], [0, 1], [0, 0]], float)
    right = np.array([[1, 0], [2, 0], [2, 1], [1, 1], [1, 0.5], [1, 0]], float)
    r = wkb.from_parts([[[left]], [[right]]])
    out = geom.dissolve_union(r)
    assert out.num_parts() == 1
    assert geom.area(out)[0] == pytest.approx(2.0)


def test_build_catchments_dissolves_mesh(ray_session):
    """build_catchments on a branch whose catchments tessellate a
    square: the stored geometry is the dissolved polygon (one part, no
    interior boundaries), and area equals the sum of the parts."""
    import pyarrow as pa
    import ray.data

    from hand_index_ray.config import EngineConfig
    from hand_index_ray.pipelines.build import build_catchments

    # 2x2 mesh in EPSG:5070-ish coords (large values exercise centering)
    base = 1_000_000.0
    quads = [_sq(base, base, base + 500, base + 500),
             _sq(base + 500, base, base + 1000, base + 500),
             _sq(base, base + 500, base + 500, base + 1000),
             _sq(base + 500, base + 500, base + 1000, base + 1000)]
    rows = [{"geometry": wkb.encode(wkb.from_parts([[[q]]]))[0],
             "branch_path": "s3://x/huc/branches/7/"} for q in quads]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = build_catchments(ds, EngineConfig(simplify_tol_m=0.0)).to_pandas()
    assert len(out) == 1
    g = wkb.decode([out["geometry"].iloc[0]])
    assert g.num_parts() == 1
    assert geom.area(g)[0] == pytest.approx(1000.0 * 1000.0)
    assert out["geom_count"].iloc[0] == 4
