"""Unit tests: image codecs, PSNR, phash (no Ray needed)."""

import numpy as np
import pytest

from hand_index_ray.kernels import image as im


def _img(h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((yy * 255 / max(h - 1, 1))[..., None] * np.array([1, 0.5, 0.25])).astype(np.uint8)
    noise = rng.integers(0, 32, size=(h, w, 3), dtype=np.uint8)
    return (base + noise).astype(np.uint8)


@pytest.mark.parametrize("fmt", ["raw", "ppm", "png"])
def test_lossless_roundtrip(fmt):
    img = _img()
    buf = im.encode(img, fmt)
    out = im.decode(buf, fmt, w=img.shape[1], h=img.shape[0])
    np.testing.assert_array_equal(out, img)


def test_qjpg_psnr_at_least_40db():
    img = _img(128, 128, seed=3)
    out = im.decode(im.encode(img, "qjpg"), "qjpg")
    assert img.shape == out.shape
    p = im.psnr(img, out)
    assert p >= 40.0, p
    # quantization error strictly bounded
    assert np.abs(img.astype(int) - out.astype(int)).max() <= 3


def test_png_filtered_decode():
    """Decode PNGs that use filters 1/2/3/4, not just filter 0."""
    import struct
    import zlib

    img = _img(16, 16, seed=1)
    h, w, _ = img.shape
    rows = []
    prev = np.zeros(w * 3, dtype=np.int16)
    for r in range(h):
        cur = img[r].reshape(-1).astype(np.int16)
        f = [0, 1, 2, 3, 4][r % 5]
        if f == 0:
            enc = cur.copy()
        elif f == 2:
            enc = (cur - prev) & 0xFF
        else:
            enc = np.empty_like(cur)
            left = np.zeros(3, dtype=np.int16)
            ul = np.zeros(3, dtype=np.int16)
            for x in range(0, w * 3, 3):
                up = prev[x : x + 3]
                px = cur[x : x + 3]
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                    pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
                enc[x : x + 3] = (px - pred) & 0xFF
                left = px
                ul = up
        rows.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    idat = zlib.compress(b"".join(rows))
    chunks = [b"\x89PNG\r\n\x1a\n"]
    for tag, body in ((b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)),
                      (b"IDAT", idat), (b"IEND", b"")):
        chunks.append(struct.pack(">I", len(body)) + tag + body
                      + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    out = im.decode(b"".join(chunks), "png")
    np.testing.assert_array_equal(out, img)


def test_psnr_identical_inf():
    img = _img()
    assert im.psnr(img, img) == float("inf")


def test_phash_properties():
    a = _img(64, 64, seed=5)
    b = np.ascontiguousarray(np.rot90(a))  # structurally different image
    ha = im.phash64(a)
    # identical → same hash
    assert im.phash64(a.copy()) == ha
    # lossy re-encode → very near
    a2 = im.decode(im.encode(a, "qjpg"), "qjpg")
    d_near = im.phash_hamming(np.array([ha]), np.array([im.phash64(a2)]))[0]
    assert d_near <= 4
    # different image → far
    d_far = im.phash_hamming(np.array([ha]), np.array([im.phash64(b)]))[0]
    assert d_far > d_near


def test_phash_hamming_vectorized():
    a = np.array([0, 0xFFFFFFFFFFFFFFFF, 0b1011], dtype=np.uint64)
    b = np.array([0, 0, 0b0010], dtype=np.uint64)
    np.testing.assert_array_equal(im.phash_hamming(a, b), [0, 64, 2])


def test_phase_correlate_batch_recovers_planted_shifts():
    from hand_index_ray.kernels import image as imk

    rng = np.random.default_rng(5)
    a = rng.integers(0, 255, (8, 24, 40)).astype(np.float64)
    shifts = [(0, 0), (1, 0), (0, 1), (23, 39), (12, 20), (5, 33),
              (17, 2), (9, 9)]
    b = np.stack([np.roll(a[i], s, (0, 1))
                  for i, s in enumerate(shifts)])
    d = imk.phase_correlate_batch(a, b)
    assert d.tolist() == [list(s) for s in shifts]


def test_phase_correlate_gain_offset_invariant():
    from hand_index_ray.kernels import image as imk

    rng = np.random.default_rng(6)
    a = rng.integers(0, 255, (1, 32, 32)).astype(np.float64)
    b = np.roll(a[0], (7, 3), (0, 1)) * 2.5 + 40.0
    d = imk.phase_correlate_batch(a, b[None])
    assert d.tolist() == [[7, 3]]


def test_block_motion_batch_finds_exact_translation():
    from hand_index_ray.kernels import image as imk

    rng = np.random.default_rng(7)
    prev = rng.integers(0, 255, (6, 32, 32))
    shifts = [(2, -3), (0, 0), (-4, 4), (4, 4), (-4, -4), (1, -1)]
    cur = np.stack([np.roll(prev[i], s, (0, 1))
                    for i, s in enumerate(shifts)])
    m = imk.block_motion_batch(prev, cur, block=8, radius=4)
    assert m[:, 2].tolist() == [0] * 6
    assert m[:, :2].tolist() == [[-s[0], -s[1]] for s in shifts]


def test_block_motion_tie_breaks_first_window():
    from hand_index_ray.kernels import image as imk

    # constant images: every candidate SAD is 0; first-wins = (-4,-4)
    prev = np.full((1, 32, 32), 9)
    m = imk.block_motion_batch(prev, prev.copy(), block=8, radius=4)
    assert m.tolist() == [[-4, -4, 0]]


def test_hough4_batch_detects_planted_lines():
    from hand_index_ray.kernels import image as imk

    S = 32
    line = np.arange(S)
    rng = np.random.default_rng(9)
    # vertical x=5, horizontal y=20, anti-diagonal x+y=30, diag x-y=-7
    cases = []
    xs_v, ys_v = np.full(S, 5), line
    cases.append((xs_v, ys_v, [0, 5, S]))
    cases.append((line, np.full(S, 20), [1, 20, S]))
    d = np.arange(31)
    cases.append((d, 30 - d, [2, 30, 31]))
    x3 = np.arange(7, 32)
    cases.append((x3, x3 - 7, [3, 7 + S - 1 - 14, 25]))  # x-y=7? see below
    # fix: x - y = 7 → rho = 7 + S - 1
    cases[3] = (x3, x3 - 7, [3, 7 + S - 1, 25])
    P = max(len(c[0]) for c in cases) + 6
    xs = np.zeros((len(cases), P), np.int64)
    ys = np.zeros((len(cases), P), np.int64)
    for i, (cx, cy, _) in enumerate(cases):
        xs[i, :len(cx)] = cx
        ys[i, :len(cy)] = cy
        # pad with repeats of the first line point (adds votes to the
        # same winning bin, never to a competitor)
        xs[i, len(cx):] = cx[0]
        ys[i, len(cy):] = cy[0]
    out = imk.hough4_batch(xs, ys, size=S)
    for i, (_, _, exp) in enumerate(cases):
        assert out[i, 0] == exp[0] and out[i, 1] == exp[1]
        assert out[i, 2] >= exp[2]


def test_bayer8_matrix_matches_published():
    from hand_index_ray.kernels.image import bayer8_matrix

    ref = np.array([
        [0, 32, 8, 40, 2, 34, 10, 42],
        [48, 16, 56, 24, 50, 18, 58, 26],
        [12, 44, 4, 36, 14, 46, 6, 38],
        [60, 28, 52, 20, 62, 30, 54, 22],
        [3, 35, 11, 43, 1, 33, 9, 41],
        [51, 19, 59, 27, 49, 17, 57, 25],
        [15, 47, 7, 39, 13, 45, 5, 37],
        [63, 31, 55, 23, 61, 29, 53, 21]], np.int64)
    m = bayer8_matrix()
    assert (m == ref).all()
    # closed bit form (the q190 oracle's expression) agrees
    y, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    cf = (16 * ((2 * (x % 2) + 3 * (y % 2)) % 4)
          + 4 * ((2 * ((x // 2) % 2) + 3 * ((y // 2) % 2)) % 4)
          + ((2 * ((x // 4) % 2) + 3 * ((y // 4) % 2)) % 4))
    assert (cf == m).all()


def test_raw_moments_batch_brute():
    from hand_index_ray.kernels.image import raw_moments_batch

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (4, 11, 17))
    got = raw_moments_batch(imgs)
    yy, xx = np.meshgrid(np.arange(11), np.arange(17), indexing="ij")
    for i in range(4):
        v = imgs[i].astype(np.int64)
        exp = [v.sum(), (v * xx).sum(), (v * yy).sum(),
               (v * xx * yy).sum(), (v * xx * xx).sum(),
               (v * yy * yy).sum()]
        assert got[i].tolist() == exp


def test_bayer_dither_gradient_monotone_density():
    from hand_index_ray.kernels.image import bayer_dither_batch

    # constant-gray images: on-pixel density must be monotone in v
    # and hit 0/64 exactly at the extremes of each 8x8 tile
    vals = np.r_[np.arange(0, 256, 4), 255]
    imgs = np.repeat(vals[:, None, None], 8, axis=1).repeat(8, axis=2)
    on = bayer_dither_batch(imgs)
    dens = on.sum(axis=(1, 2))
    assert (np.diff(dens) >= 0).all()
    assert dens[0] == 0 and dens[-1] == 64


def test_directed_hausdorff_masks_brute():
    from hand_index_ray.kernels.image import directed_hausdorff_masks

    rng = np.random.default_rng(1)
    masks = rng.random((5, 12, 16)) < 0.1
    masks[:, 3, 4] = True  # guarantee non-empty
    pts = np.array([[2, 3], [10, 8], [15, 0]], np.int64)
    hab, hba = directed_hausdorff_masks(masks, pts)
    for i in range(5):
        A = np.argwhere(masks[i])  # (y, x)
        dab = max(min((ax - bx) ** 2 + (ay - by) ** 2
                      for bx, by in pts) for ay, ax in A)
        dba = max(min((ax - bx) ** 2 + (ay - by) ** 2
                      for ay, ax in A) for bx, by in pts)
        assert hab[i] == dab and hba[i] == dba
