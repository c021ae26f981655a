"""GIF89a codec (kernels/gif.py): LZW, palettes, animation,
interlace, disposal, transparency."""

import struct

import numpy as np
import pytest

from hand_index_ray.kernels import gif


def _rng(s):
    return np.random.default_rng(s)


def test_lzw_roundtrip_growth_and_clear():
    rng = _rng(0)
    for n, mc in [(5, 2), (1000, 4), (70000, 8)]:
        data = bytes(rng.integers(0, 1 << mc, n, dtype=np.uint8))
        assert gif._lzw_decode_gif(gif._lzw_encode_gif(data, mc),
                                   mc) == data
    rep = b"xyzxyzxyq" * 20000  # deep dictionary + 12-bit clears
    assert gif._lzw_decode_gif(gif._lzw_encode_gif(rep, 8), 8) == rep


def test_single_frame_roundtrip():
    rng = _rng(1)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (21, 34), dtype=np.uint8)
    frames, info = gif.decode_gif(gif.encode_gif(idx, pal))
    assert info["n_frames"] == 1 and info["w"] == 34
    np.testing.assert_array_equal(frames[0], pal[idx])


def test_animation_and_delays():
    rng = _rng(2)
    fs = [rng.integers(0, 8, (12, 15), dtype=np.uint8)
          for _ in range(4)]
    ps = [rng.integers(0, 256, (8, 3), dtype=np.uint8)
          for _ in range(4)]
    frames, info = gif.decode_gif(
        gif.encode_gif(fs, ps, delays=[5, 6, 7, 8]))
    assert info["delays"] == [5, 6, 7, 8]
    for f, i, p in zip(frames, fs, ps):
        np.testing.assert_array_equal(f, p[i])


def test_transparency_composites_over_previous():
    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0],
                    [0, 0, 200]], np.uint8)
    f0 = np.full((6, 6), 1, np.uint8)
    f1 = np.full((6, 6), 0, np.uint8)  # index 0 = transparent
    f1[2:4, 2:4] = 2
    frames, _ = gif.decode_gif(gif.encode_gif(
        [f0, f1], [pal, pal], delays=[1, 1], transparent=[None, 0]))
    np.testing.assert_array_equal(frames[0], pal[f0])
    want = pal[f0].copy()
    want[2:4, 2:4] = pal[2]
    np.testing.assert_array_equal(frames[1], want)


def test_interlaced_frame():
    """Hand-build an interlaced stream: rows stored in GIF 4-pass
    order; decoder must de-interlace."""
    rng = _rng(3)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (10, 7), dtype=np.uint8)
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, 10, step))
    stored = idx[order]
    raw, exp = gif._color_table(pal)
    out = bytearray(b"GIF89a" + struct.pack("<HHBBB", 7, 10, 0, 0, 0))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 7, 10)
    out += bytes([0x80 | 0x40 | exp]) + raw
    mc = max(2, exp + 1)
    out.append(mc)
    comp = gif._lzw_encode_gif(stored.tobytes(), mc)
    for s in range(0, len(comp), 255):
        c = comp[s:s + 255]
        out.append(len(c))
        out += c
    out += b"\x00\x3b"
    frames, _ = gif.decode_gif(bytes(out))
    np.testing.assert_array_equal(frames[0], pal[idx])


def test_disposal_restore_background():
    """Disposal 2 restores the GCT background before the next frame."""
    gct = np.array([[7, 7, 7], [250, 0, 0]], np.uint8)
    raw, exp = gif._color_table(gct)
    out = bytearray(b"GIF89a"
                    + struct.pack("<HHBBB", 4, 4, 0x80 | exp, 0, 0))
    out += raw
    # frame 1: all index 1, disposal 2
    out += b"\x21\xf9\x04" + bytes([0x08]) + b"\x01\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 4) + b"\x00"
    mc = 2
    out.append(mc)
    comp = gif._lzw_encode_gif(bytes([1] * 16), mc)
    out.append(len(comp)); out += comp; out.append(0)
    # frame 2: 2x2 sub-frame at (1,1), index 1
    out += b"\x2c" + struct.pack("<HHHH", 1, 1, 2, 2) + b"\x00"
    out.append(mc)
    comp = gif._lzw_encode_gif(bytes([1] * 4), mc)
    out.append(len(comp)); out += comp; out.append(0)
    out += b"\x3b"
    frames, _ = gif.decode_gif(bytes(out))
    assert (frames[0] == gct[1]).all()
    want = np.tile(gct[0], (4, 4, 1))
    want[1:3, 1:3] = gct[1]
    np.testing.assert_array_equal(frames[1], want)


def test_errors():
    with pytest.raises(ValueError):
        gif.decode_gif(b"NOTAGIF" + b"\x00" * 20)
    with pytest.raises(ValueError):
        gif._lzw_decode_gif(bytes([0xFF, 0xFF, 0xFF]), 2)


def test_image_integration():
    from hand_index_ray.kernels import image as im

    rng = _rng(4)
    pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
    idx = rng.integers(0, 32, (9, 11), dtype=np.uint8)
    blob = gif.encode_gif(idx, pal)
    assert im.sniff_format(blob) == "gif"
    np.testing.assert_array_equal(im.decode(blob, "gif"), pal[idx])
