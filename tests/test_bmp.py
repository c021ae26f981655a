"""BMP codec (kernels/bmp.py): 24-bit, 8-bit palette, RLE8."""

import numpy as np
import pytest

from hand_index_ray.kernels import bmp
from hand_index_ray.kernels import image as im


def test_24bit_roundtrip_padding():
    rng = np.random.default_rng(0)
    for w in (1, 2, 3, 4, 9):  # exercise 4-byte row padding
        img = rng.integers(0, 256, (5, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            bmp.decode_bmp(bmp.encode_bmp(img)), img)


def test_palette_roundtrip():
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
    idx = rng.integers(0, 32, (7, 11), dtype=np.uint8)
    np.testing.assert_array_equal(
        bmp.decode_bmp(bmp.encode_bmp(idx, palette=pal)), pal[idx])


def test_rle8_roundtrip_patterns():
    pal = np.random.default_rng(2).integers(0, 256, (16, 3),
                                            dtype=np.uint8)
    for seed in range(12):
        rng = np.random.default_rng(seed)
        h, w = int(rng.integers(1, 16)), int(rng.integers(1, 40))
        if seed % 3 == 0:  # long runs
            a = np.repeat(rng.integers(0, 4, (h, max(1, w // 6))),
                          6, axis=1)[:, :w].astype(np.uint8)
        else:  # noisy literals
            a = rng.integers(0, 16, (h, w), dtype=np.uint8)
        blob = bmp.encode_bmp(a, palette=pal, rle=True)
        np.testing.assert_array_equal(bmp.decode_bmp(blob), pal[a])
    # long-run file is smaller than uncompressed
    runs = np.zeros((32, 64), np.uint8)
    assert len(bmp.encode_bmp(runs, palette=pal, rle=True)) < \
        len(bmp.encode_bmp(runs, palette=pal))


def test_rle8_delta_escape():
    """Hand-built stream with the 0,2 delta escape (our encoder never
    emits it; real files do)."""
    import struct
    pal = np.zeros((256, 4), np.uint8)
    pal[1] = [0, 0, 255, 0]  # BGR -> red
    data = bytes([2, 1, 0, 2, 3, 1, 2, 1, 0, 0, 0, 1])
    off = 14 + 40 + 1024
    hdr = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, 8, 2, 1, 8, 1,
                         len(data), 0, 0, 256, 0))
    out = bmp.decode_bmp(hdr + pal.tobytes() + data)
    # bottom-up: stored row 0 is image row 1
    assert (out[1, 0:2] == [255, 0, 0]).all()
    assert (out[1, 2:5] == 0).all()      # delta-skipped pixels stay 0
    assert (out[0, 5:7] == [255, 0, 0]).all()  # after dy=1


def test_errors_and_sniff():
    with pytest.raises(ValueError):
        bmp.decode_bmp(b"XX" + b"\x00" * 60)
    img = np.zeros((3, 3, 3), np.uint8)
    blob = bmp.encode_bmp(img)
    assert im.sniff_format(blob) == "bmp"
    np.testing.assert_array_equal(im.decode(blob, "bmp"), img)
