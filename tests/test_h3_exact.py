"""Uber-H3 bit-exact cell encoding (kernels/h3exact.py) — golden
vectors from the published H3 docs, geometric self-consistency of the
vendored tables, and encode/decode round-trips.

Reference parity target: DuckDB community h3 extension's
h3_latlng_to_cell (reference load.py:164-168), i.e. the Uber h3 C
library. Confidence tiers:

- hexagon base cells (110/122, ~97% of Earth): pinned by golden
  vectors in two regions + the forced geometry (every in-triangle
  rotation is 0 or a fold rotation, both derived from exact integer
  lattice isometries — no recalled rotation constants at all);
- pentagon base cells (12/122): rotation entries derived empirically
  from encode/decode consistency against the published inverse
  algorithm structure; no in-sandbox golden vector reaches them —
  best-effort, flagged here.
"""
import numpy as np
import pytest

from hand_index_ray.kernels import h3exact as h3

GOLDEN = [
    # (lat, lng, res, cell) — h3-py/h3-js quickstarts and Uber docs
    (37.3615593, -122.0553238, 5, "85283473fffffff"),
    (37.3615593, -122.0553238, 7, "87283472bffffff"),
    (37.7752702151959257, -122.418307270836565, 9, "8928308280fffff"),
    (48.8566, 2.3522, 9, "891fb466257ffff"),
]


def test_golden_vectors_bit_exact():
    for lat, lng, res, want in GOLDEN:
        got = h3.h3_to_string(
            h3.latlng_to_cell(np.array([lat]), np.array([lng]), res))[0]
        assert got == want, (lat, lng, res, got, want)


def test_golden_center_inverse():
    lat, lng = h3.cell_to_latlng(h3.string_to_h3("85283473fffffff"))
    assert abs(lat[0] - 37.34579337536848) < 1e-9
    assert abs(lng[0] - (-121.97637597255124)) < 1e-9


def test_face_tables_self_consistent():
    """Transcription checks: the 20 face centers form a regular
    icosahedron (every face exactly 3 neighbors at one shared angle)
    and each face's three axis azimuths are exactly 120° apart."""
    fc = h3._FACE_XYZ
    assert np.allclose(np.linalg.norm(fc, axis=1), 1.0, atol=1e-12)
    d = fc @ fc.T
    np.fill_diagonal(d, -1)
    mx = d.max()
    assert ((d > mx - 1e-9).sum(axis=1) == 3).all()
    az = h3.FACE_AXES_AZ
    tau = 2 * np.pi
    assert np.abs(np.mod(az[:, 0] - az[:, 1], tau) - tau / 3).max() < 1e-12
    assert np.abs(np.mod(az[:, 1] - az[:, 2], tau) - tau / 3).max() < 1e-12


def test_base_cell_table_coincidence():
    """The geometric derivation itself is the check: every coarse
    lattice position on every face must coincide (≤1e-12) with exactly
    one of the 122 recalled home centers, pentagons must sit on the 12
    icosahedron vertices (5 faces each), and the fold isometries must
    map shared edges exactly — any BASE_CELL_DATA transcription error
    raises inside _derive_tables."""
    t = h3._derive_tables()
    assert (t["bc"] >= 0).all()
    assert len(np.unique(t["bc"])) == 122
    pent = np.nonzero(h3.IS_PENTAGON)[0]
    assert len(pent) == 12
    assert sorted(pent.tolist()) == [4, 14, 24, 38, 49, 58, 63, 72,
                                     83, 97, 107, 117]
    for b in pent:
        assert len(t["faces_of"][int(b)]) == 5
    # hexagons touch 1-2 faces in-triangle
    for b in range(122):
        if not h3.IS_PENTAGON[b]:
            assert 1 <= len(t["faces_of"][b]) <= 2


def test_index_bit_layout():
    c = h3.latlng_to_cell(np.array([37.0]), np.array([-122.0]), 9)[0]
    assert (int(c) >> 63) == 0  # reserved high bit
    assert ((int(c) >> 59) & 0xF) == 1  # cell mode
    assert ((int(c) >> 52) & 0xF) == 9  # resolution
    assert ((int(c) >> 45) & 0x7F) < 122  # base cell
    # digits 10-15 unused -> 7
    for r in range(10, 16):
        assert ((int(c) >> ((15 - r) * 3)) & 0x7) == 7


@pytest.mark.parametrize("res", [0, 1, 2, 5, 7, 9])
def test_roundtrip_global(res):
    """encode(center(encode(p))) == encode(p) for random global points
    — covers every base cell family including all 12 pentagons."""
    rng = np.random.default_rng(7)
    n = 6000
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180, 180, n)
    c = h3.latlng_to_cell(lat, lng, res)
    clat, clng = h3.cell_to_latlng(c)
    c2 = h3.latlng_to_cell(clat, clng, res)
    assert (c == c2).all()
    if res == 0:
        bcs = np.unique((c >> np.uint64(45)) & np.uint64(0x7F))
        assert len(bcs) == 122


def test_hierarchy_mostly_nested():
    """H3's hierarchy is approximately spatially nested: the res-5
    encode of a point should equal the digit-truncated parent of its
    res-9 encode for the overwhelming majority of points (exact
    nesting is not an H3 property; near-boundary flips are expected)."""
    rng = np.random.default_rng(11)
    n = 4000
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180, 180, n)
    c9 = h3.latlng_to_cell(lat, lng, 9)
    c5 = h3.latlng_to_cell(lat, lng, 5)
    # parent: set res=5, set digits 6..9 to 7
    parent = c9.copy()
    parent &= ~(np.uint64(0xF) << np.uint64(52))
    parent |= np.uint64(5) << np.uint64(52)
    for r in range(6, 10):
        parent |= np.uint64(7) << np.uint64((15 - r) * 3)
    # measured 93%: disagreements are all adjacent cells one res-5
    # spacing apart — the fractal child-union boundary band across 4
    # resolution levels (real H3 behaves the same; exact nesting would
    # actually be WRONG)
    agree = (parent == c5).mean()
    assert agree > 0.90, agree


def test_pentagon_cells_have_no_leading_k():
    """Valid pentagon-base indexes never lead with the deleted K axis
    (the cw-offset adjustment must fire)."""
    t = h3._derive_tables()
    rng = np.random.default_rng(3)
    for b in np.nonzero(h3.IS_PENTAGON)[0]:
        f = int(h3.BASE_CELL_DATA[b, 0])
        vlat, vlng = h3._face_ijk_res0_to_geo(f, h3.BASE_CELL_DATA[b, 1:4])
        az = rng.uniform(0, 2 * np.pi, 500)
        rad = rng.uniform(0.0, 0.15, 500)
        slat, slng = h3._geo_az_distance(vlat, vlng, az, rad)
        c = h3.latlng_to_cell(np.degrees(slat), np.degrees(slng), 6)
        bc = ((c >> np.uint64(45)) & np.uint64(0x7F)).astype(int)
        m = bc == b
        assert m.any()
        lead = h3._leading_nonzero_digit(c[m], 6)
        assert (lead != np.uint64(1)).all()


def test_parent_child_hierarchy():
    c = h3.string_to_h3("8928308280fffff")
    p = h3.cell_to_parent(c, 5)
    assert h3.h3_to_string(p)[0] == "85283083fffffff"
    assert h3.get_resolution(p)[0] == 5
    kids = h3.cell_to_children(int(p[0]), 6)
    assert len(kids) == 7
    assert (h3.cell_to_parent(kids, 5) == p[0]).all()
    # every res-9 point cell truncates into its res-5 ancestor's children
    kids9 = h3.cell_to_children(int(p[0]), 7)
    assert len(kids9) == 49

    # pentagon: 6 children at +1, 1 + 5*(7^k - 1)/6 at depth k
    pent0 = np.uint64((1 << 59) | (0 << 52) | (4 << 45) | 0x1FFFFFFFFFFF)
    assert len(h3.cell_to_children(int(pent0), 1)) == 6
    assert len(h3.cell_to_children(int(pent0), 2)) == 41
    # children of a pentagon never lead with the deleted K axis
    kids = h3.cell_to_children(int(pent0), 2)
    lead = h3._leading_nonzero_digit(kids, 2)
    assert (lead != np.uint64(1)).all()


def test_cell_to_latlng_mixed_resolutions():
    rng = np.random.default_rng(2)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 50)))
    lng = rng.uniform(-180, 180, 50)
    c5 = h3.latlng_to_cell(lat, lng, 5)
    c9 = h3.latlng_to_cell(lat, lng, 9)
    mixed = np.concatenate([c5, c9])
    mlat, mlng = h3.cell_to_latlng(mixed)
    lat5, lng5 = h3.cell_to_latlng(c5)
    lat9, lng9 = h3.cell_to_latlng(c9)
    assert np.allclose(mlat, np.concatenate([lat5, lat9]))
    assert np.allclose(mlng, np.concatenate([lng5, lng9]))
