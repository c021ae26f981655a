"""Property-based tests (hypothesis) for the geometry/cell kernels —
the FIXTURES.md F6 invariants fuzzed over random inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hand_index_ray.kernels import geom, proj, s2, wkb

settings.register_profile("fast", max_examples=40, deadline=None)
settings.load_profile("fast")


def _convex_ring(cx, cy, r, m):
    ang = 2 * np.pi * np.arange(m) / m
    return np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)


coords = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)


@given(cx=coords, cy=coords,
       r=st.floats(min_value=0.1, max_value=1e4),
       m=st.integers(min_value=3, max_value=32))
def test_wkb_roundtrip_and_area(cx, cy, r, m):
    ring = _convex_ring(cx, cy, r, m)
    rag = wkb.from_parts([[[ring]]])
    back = wkb.decode(wkb.encode(rag))
    np.testing.assert_allclose(back.coords, rag.coords)
    # regular m-gon area formula
    expect = 0.5 * m * r * r * np.sin(2 * np.pi / m)
    got = geom.area(rag)[0]
    assert abs(got - expect) <= 1e-6 * max(expect, 1.0)


@given(cx=st.floats(-100, 100), cy=st.floats(-100, 100),
       r=st.floats(1.0, 50.0), m=st.integers(3, 20),
       px=st.floats(-200, 200), py=st.floats(-200, 200))
def test_pip_matches_distance_for_circle_like(cx, cy, r, m, px, py):
    """For a regular m-gon: inside iff distance < apothem (definitely in)
    or > circumradius (definitely out); skip the annulus in between."""
    ring = _convex_ring(cx, cy, r, m)
    rag = wkb.from_parts([[[ring]]])
    d = np.hypot(px - cx, py - cy)
    apothem = r * np.cos(np.pi / m)
    inside = geom.points_in_geom(np.array([px]), np.array([py]), rag)[0]
    if d < apothem * 0.999:
        assert inside
    elif d > r * 1.001:
        assert not inside


@given(lon=st.floats(-125, -66), lat=st.floats(24, 50))
def test_proj_roundtrip_property(lon, lat):
    x, y = proj.lonlat_to_albers(np.array([lon]), np.array([lat]))
    lon2, lat2 = proj.albers_to_lonlat(x, y)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


@given(lon=st.floats(-179.9, 179.9), lat=st.floats(-85, 85),
       level=st.integers(1, 24))
def test_s2_center_containment_property(lon, lat, level):
    cid = s2.lonlat_to_cell(np.array([lon]), np.array([lat]), level)
    assert int(s2.cell_level(cid)[0]) == level
    clon, clat = s2.cell_to_lonlat(cid)
    assert (s2.lonlat_to_cell(clon, clat, level) == cid).all()
    # parent nesting
    if level > 1:
        par = s2.parent(cid, level - 1)
        lo, hi = s2.cell_range(par)
        assert lo[0] <= cid[0] <= hi[0]


@given(ax=st.floats(-100, -70), ay=st.floats(26, 44),
       w1=st.floats(0.01, 3), h1=st.floats(0.01, 3),
       dx=st.floats(-0.5, 0.5), dy=st.floats(-0.5, 0.5),
       w2=st.floats(0.01, 3), h2=st.floats(0.01, 3),
       level=st.integers(4, 10))
def test_cover_bbox_shared_cell_property(ax, ay, w1, h1, dx, dy, w2, h2, level):
    """Any two overlapping bboxes share a covering cell at a fixed level."""
    b1 = (ax, ay, ax + w1, ay + h1)
    # construct b2 to overlap b1 (contains an interior point of b1)
    ix = ax + w1 / 2 + dx * min(w1, 1) / 2
    iy = ay + h1 / 2 + dy * min(h1, 1) / 2
    b2 = (ix - w2 / 2, iy - h2 / 2, ix + w2 / 2, iy + h2 / 2)
    c1 = s2.cover_bbox(*b1, level=level)
    c2 = s2.cover_bbox(*b2, level=level)
    assert len(np.intersect1d(c1, c2)) > 0


@given(cx=st.floats(-50, 50), cy=st.floats(-50, 50),
       r=st.floats(0.5, 20), m=st.integers(3, 16),
       bx=st.floats(-60, 60), by=st.floats(-60, 60),
       bw=st.floats(0.1, 40), bh=st.floats(0.1, 40))
def test_clip_area_bounds_property(cx, cy, r, m, bx, by, bw, bh):
    """0 ≤ area(poly ∩ rect) ≤ min(area(poly), area(rect)); clipping by
    a containing rect returns the polygon area."""
    ring = _convex_ring(cx, cy, r, m)
    poly = wkb.from_parts([[[ring]]])
    rect = wkb.from_parts([[[np.array([[bx, by], [bx + bw, by],
                                       [bx + bw, by + bh], [bx, by + bh], [bx, by]])]]])
    a = geom.clip_area(poly, 0, rect, 0)
    pa = geom.area(poly)[0]
    ra = bw * bh
    assert -1e-9 <= a <= min(pa, ra) * (1 + 1e-9) + 1e-9
    big = wkb.from_parts([[[np.array([
        [cx - 2 * r, cy - 2 * r], [cx + 2 * r, cy - 2 * r],
        [cx + 2 * r, cy + 2 * r], [cx - 2 * r, cy + 2 * r], [cx - 2 * r, cy - 2 * r]])]]])
    full = geom.clip_area(poly, 0, big, 0)
    assert abs(full - pa) <= 1e-6 * max(pa, 1.0)


@given(areas=st.lists(st.floats(0, 1e6, allow_nan=False), min_size=1, max_size=20),
       thr=st.floats(0, 100))
def test_overlap_threshold_monotone_property(areas, thr):
    areas = np.asarray(areas)
    inter = areas * 0.5
    pct = geom.overlap_stats(areas, inter)
    assert np.isfinite(pct).all()
    assert (pct >= 0).all()
    k1 = geom.keep_mask(np.zeros(len(areas), bool), np.zeros(len(areas), bool), pct, thr)
    k2 = geom.keep_mask(np.zeros(len(areas), bool), np.zeros(len(areas), bool), pct, thr + 1)
    assert not (k2 & ~k1).any()  # raising threshold never adds rows


@given(n=st.integers(1, 2000),
       rate=st.sampled_from([8000, 16000, 44100]),
       bits=st.sampled_from([8, 16, 24, 32]),
       channels=st.integers(1, 4),
       seed=st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(n, rate, bits, channels, seed):
    """decode(encode(x)) ≈ x within the bit depth's quantization step,
    any length / rate / depth / channel count."""
    from hand_index_ray.kernels.audio import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    x = rng.uniform(-0.999, 0.999, (n, channels))
    out, got_rate = decode_wav(encode_wav(x, rate, bits=bits, channels=channels))
    assert got_rate == rate
    assert len(out) == n
    tol = {8: 1 / 128, 16: 1 / 32768, 24: 1 / 8388608, 32: 1e-6}[bits]
    np.testing.assert_allclose(out, x.mean(axis=1), atol=tol)


@given(nf=st.integers(1, 6),
       h=st.integers(1, 24).map(lambda v: v * 2),
       w=st.integers(1, 24).map(lambda v: v * 2),
       seed=st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_y4m_c444_roundtrip_property(nf, h, w, seed):
    """C444 frames round-trip within BT.601 uint8 rounding (PSNR>40dB)
    at any even geometry; frame seek is exact at every index."""
    from hand_index_ray.kernels.image import psnr
    from hand_index_ray.kernels.video import (count_y4m_frames,
                                              decode_y4m_frame, encode_y4m)

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
    buf = encode_y4m(frames, colorspace="C444")
    assert count_y4m_frames(buf) == nf
    for i in (0, nf // 2, nf - 1):
        assert psnr(decode_y4m_frame(buf, i), frames[i]) > 40.0
