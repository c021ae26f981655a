"""Z-order (Morton) indexing kernels: roundtrip, exact bbox covers,
coarsened-cover contract, vectorized range membership."""

import numpy as np

from hand_index_ray.kernels import zorder as z


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1 << 16, 5000)
    y = rng.integers(0, 1 << 16, 5000)
    k = z.encode(x, y)
    dx, dy = z.decode(k)
    np.testing.assert_array_equal(dx, x)
    np.testing.assert_array_equal(dy, y)
    # key order groups quadrants: top-level bit of key = top bit of x
    assert (np.asarray(k >> np.uint64(31), np.int64)
            == (x >> 15)).all()


def test_known_values():
    np.testing.assert_array_equal(
        z.encode(np.array([0, 1, 0, 1, 7]), np.array([0, 0, 1, 1, 5])),
        np.array([0, 2, 1, 3, 0b111011], np.uint64))


def test_exact_bbox_cover_bruteforce():
    xs, ys = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    keys = z.encode(xs.ravel(), ys.ravel()).astype(np.int64)
    rects = [(0, 0, 63, 63), (5, 9, 40, 33), (17, 17, 17, 17),
             (0, 60, 63, 63), (31, 0, 32, 63)]
    for x0, y0, x1, y1 in rects:
        r = z.bbox_ranges(x0, y0, x1, y1, 6, max_ranges=10 ** 9)
        inside = ((xs.ravel() >= x0) & (xs.ravel() <= x1)
                  & (ys.ravel() >= y0) & (ys.ravel() <= y1))
        got = z.keys_in_ranges(keys, r)
        np.testing.assert_array_equal(got, inside)
        # ranges are sorted, disjoint, coalesced
        assert (r[1:, 0] > r[:-1, 1] + 1).all()


def test_coarsened_cover_supersets():
    xs, ys = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    keys = z.encode(xs.ravel(), ys.ravel()).astype(np.int64)
    r = z.bbox_ranges(3, 5, 50, 61, 6, max_ranges=5)
    assert len(r) <= 5
    inside = ((xs.ravel() >= 3) & (xs.ravel() <= 50)
              & (ys.ravel() >= 5) & (ys.ravel() <= 61))
    got = z.keys_in_ranges(keys, r)
    assert (got | ~inside).all()  # never misses a true hit


def test_keys_in_ranges_edges():
    r = np.array([[4, 7], [10, 10]], np.int64)
    np.testing.assert_array_equal(
        z.keys_in_ranges(np.array([3, 4, 7, 8, 10, 11]), r),
        [False, True, True, False, True, False])
    assert not z.keys_in_ranges(np.array([1, 2]),
                                np.zeros((0, 2), np.int64)).any()


def test_hilbert_bijection_adjacency_roundtrip():
    from hand_index_ray.kernels import hilbert

    for order in (1, 2, 3, 5, 6):
        n = 1 << order
        xx, yy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        d = hilbert.encode(xx.ravel(), yy.ravel(), order)
        assert sorted(d.tolist()) == list(range(n * n))  # bijection
        x2, y2 = hilbert.decode(d, order)
        assert (x2 == xx.ravel()).all() and (y2 == yy.ravel()).all()
        # THE Hilbert property Morton lacks: consecutive keys are unit
        # grid steps
        px, py = hilbert.decode(np.arange(n * n), order)
        steps = np.abs(np.diff(px)) + np.abs(np.diff(py))
        assert (steps == 1).all()
        # quadrant recursion: the first quarter of keys fills exactly
        # one quadrant
        qx, qy = px[: n * n // 4], py[: n * n // 4]
        assert qx.max() < n // 2 and qy.max() < n // 2


def test_hilbert_locality_beats_morton():
    """Mean |Δgrid| over one key step is exactly 1 for Hilbert; Morton
    jumps at quadrant seams. Quantifies the documented locality claim."""
    from hand_index_ray.kernels import hilbert

    order = 6
    n = 1 << order
    px, py = hilbert.decode(np.arange(n * n), order)
    assert (np.abs(np.diff(px)) + np.abs(np.diff(py))).max() == 1
    xx, yy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    mk = z.encode(xx.ravel().astype(np.uint32), yy.ravel().astype(np.uint32))
    order_idx = np.argsort(mk)
    mx, my = xx.ravel()[order_idx], yy.ravel()[order_idx]
    mort_steps = np.abs(np.diff(mx)) + np.abs(np.diff(my))
    assert mort_steps.max() > 1  # morton seam jumps exist
