"""Full PNG codec (kernels/png.py): color types, bit depths, Adam7,
adaptive filters, and parity with the image.py integration."""

import struct
import zlib

import numpy as np
import pytest

from hand_index_ray.kernels import image as im
from hand_index_ray.kernels import png


def _rng(seed):
    return np.random.default_rng(seed)


def test_rgb_roundtrip_adaptive():
    img = _rng(0).integers(0, 256, (23, 31, 3), dtype=np.uint8)
    blob = png.encode(img)
    out, info = png.decode(blob, verify_crc=True)
    np.testing.assert_array_equal(out, img)
    assert info["color_type"] == 2 and info["depth"] == 8
    # gradient rows compress far better with Sub/Up than filter 0
    grad = np.add.outer(np.arange(64), np.arange(64))[:, :, None] \
        .repeat(3, 2).astype(np.uint8)
    assert len(png.encode(grad)) < len(im.encode(grad, "png"))
    np.testing.assert_array_equal(png.decode_rgb(png.encode(grad)), grad)


def test_gray_and_rgba():
    g = _rng(1).integers(0, 256, (17, 19), dtype=np.uint8)
    out, info = png.decode(png.encode(g), verify_crc=True)
    np.testing.assert_array_equal(out, g)
    assert info["color_type"] == 0
    np.testing.assert_array_equal(png.decode_rgb(png.encode(g)),
                                  np.repeat(g[:, :, None], 3, axis=2))
    ra = _rng(2).integers(0, 256, (11, 13, 4), dtype=np.uint8)
    out, info = png.decode(png.encode(ra))
    np.testing.assert_array_equal(out, ra)
    assert info["color_type"] == 6
    np.testing.assert_array_equal(png.decode_rgb(png.encode(ra)),
                                  ra[:, :, :3])


def test_palette():
    idx = _rng(3).integers(0, 16, (21, 14), dtype=np.uint8)
    pal = _rng(4).integers(0, 256, (16, 3), dtype=np.uint8)
    blob = png.encode(idx, palette=pal)
    out, info = png.decode(blob, verify_crc=True)
    np.testing.assert_array_equal(out, pal[idx])
    assert info["color_type"] == 3
    np.testing.assert_array_equal(png.decode_rgb(blob), pal[idx])
    with pytest.raises(ValueError):
        png.encode(np.full((4, 4), 16, np.uint8), palette=pal)


def test_adam7_canonical_pattern():
    """Pin the pass table to the spec's published 8x8 pattern — a
    self-consistent wrong table would still roundtrip, so the
    roundtrip test alone cannot catch a transcription slip."""
    want = np.array([[1, 6, 4, 6, 2, 6, 4, 6],
                     [7, 7, 7, 7, 7, 7, 7, 7],
                     [5, 6, 5, 6, 5, 6, 5, 6],
                     [7, 7, 7, 7, 7, 7, 7, 7],
                     [3, 6, 4, 6, 3, 6, 4, 6],
                     [7, 7, 7, 7, 7, 7, 7, 7],
                     [5, 6, 5, 6, 5, 6, 5, 6],
                     [7, 7, 7, 7, 7, 7, 7, 7]])
    got = np.zeros((8, 8), int)
    for i, (x0, y0, dx, dy) in enumerate(png._ADAM7):
        got[y0::dy, x0::dx] = i + 1
    np.testing.assert_array_equal(got, want)


def test_adam7_interlace():
    for shape in [(16, 16, 3), (13, 9, 3), (7, 5, 3), (1, 1, 3), (2, 3, 3)]:
        img = _rng(sum(shape)).integers(0, 256, shape, dtype=np.uint8)
        blob = png.encode(img, interlace=True)
        out, info = png.decode(blob, verify_crc=True)
        assert info["interlace"] == 1
        np.testing.assert_array_equal(out, img)
    g = _rng(9).integers(0, 256, (10, 11), dtype=np.uint8)
    np.testing.assert_array_equal(png.decode(png.encode(
        g, interlace=True))[0], g)


def _manual_png(w, h, depth, ctype, scanlines, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    idat = zlib.compress(scanlines)
    out = [png.SIG]
    for tag, body in ((b"IHDR", ihdr),) + tuple(extra and [extra] or []) \
            + ((b"IDAT", idat), (b"IEND", b"")):
        if isinstance(tag, bytes) and len(tag) == 4:
            out.append(struct.pack(">I", len(body)) + tag + body
                       + struct.pack(">I", zlib.crc32(tag + body)
                                     & 0xFFFFFFFF))
    return b"".join(out)


def test_bit_depths_sub_byte():
    # 1-bit gray, 6 px wide: rows packed MSB-first
    # row0: 1,0,1,1,0,1 -> 0b10110100 ; row1: 0,1,0,0,1,0 -> 0b01001000
    blob = _manual_png(6, 2, 1, 0, b"\x00\xb4" + b"\x00\x48")
    out, info = png.decode(blob)
    np.testing.assert_array_equal(out, [[1, 0, 1, 1, 0, 1],
                                        [0, 1, 0, 0, 1, 0]])
    rgb = png.decode_rgb(blob)
    np.testing.assert_array_equal(rgb[..., 0], np.array(out) * 255)
    # 4-bit gray: samples 0xA, 0x3, 0xF in 2 bytes (last nibble pad)
    blob = _manual_png(3, 1, 4, 0, b"\x00\xa3\xf0")
    out, _ = png.decode(blob)
    np.testing.assert_array_equal(out, [[10, 3, 15]])
    assert png.decode_rgb(blob)[0, 1, 0] == 3 * 17


def test_16bit():
    v = _rng(5).integers(0, 65536, (9, 7), dtype=np.uint16)
    rows = b"".join(b"\x00" + v[r].astype(">u2").tobytes()
                    for r in range(9))
    blob = _manual_png(7, 9, 16, 0, rows)
    out, info = png.decode(blob)
    assert info["depth"] == 16
    np.testing.assert_array_equal(np.asarray(out, np.uint16), v)
    np.testing.assert_array_equal(png.decode_rgb(blob)[..., 0],
                                  (v >> 8).astype(np.uint8))


def test_trns_palette_alpha():
    pal = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    trns = struct.pack(">I", 1)[3:] + b""  # alpha 0 for index 0 only
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    scan = b"\x00\x00\x01"
    chunks = [png.SIG]
    for tag, body in ((b"IHDR", ihdr), (b"PLTE", pal.tobytes()),
                      (b"tRNS", b"\x00"), (b"IDAT", zlib.compress(scan)),
                      (b"IEND", b"")):
        chunks.append(struct.pack(">I", len(body)) + tag + body
                      + struct.pack(">I", zlib.crc32(tag + body)
                                    & 0xFFFFFFFF))
    out, info = png.decode(b"".join(chunks))
    assert info["channels"] == 4
    np.testing.assert_array_equal(out[0, 0], [255, 0, 0, 0])
    np.testing.assert_array_equal(out[0, 1], [0, 255, 0, 255])


def test_all_filters_foreign_stream():
    """Hand-filtered stream using every filter type incl. Avg/Paeth
    (our encoder never emits them) — decode must reconstruct."""
    img = _rng(6).integers(0, 256, (10, 8, 3), dtype=np.uint8)
    rows = []
    prev = np.zeros(24, np.int16)
    for r in range(10):
        cur = img[r].reshape(-1).astype(np.int16)
        f = r % 5
        if f == 0:
            enc = cur.copy()
        elif f == 2:
            enc = (cur - prev) & 0xFF
        else:
            enc = np.empty_like(cur)
            left = np.zeros(3, np.int16)
            ul = np.zeros(3, np.int16)
            for x in range(0, 24, 3):
                up = prev[x:x + 3]
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa, pb, pc = (np.abs(p - left), np.abs(p - up),
                                  np.abs(p - ul))
                    pred = np.where((pa <= pb) & (pa <= pc), left,
                                    np.where(pb <= pc, up, ul))
                enc[x:x + 3] = (cur[x:x + 3] - pred) & 0xFF
                left = cur[x:x + 3]
                ul = up
        rows.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    blob = _manual_png(8, 10, 8, 2, b"".join(rows))
    np.testing.assert_array_equal(png.decode(blob)[0], img)


def test_errors_and_crc():
    with pytest.raises(ValueError):
        png.decode(b"notapng\x00" * 4)
    img = _rng(7).integers(0, 256, (4, 4, 3), dtype=np.uint8)
    blob = bytearray(png.encode(img))
    blob[40] ^= 0xFF  # corrupt inside IDAT body
    with pytest.raises((ValueError, zlib.error)):
        png.decode(bytes(blob), verify_crc=True)
    # bad depth/type combination
    with pytest.raises(ValueError):
        png.decode(_manual_png(2, 1, 4, 2, b"\x00\x00\x00"))


def test_image_py_integration():
    """image.decode('png') now routes through the full decoder: a
    GRAYSCALE png decodes via the standard pipeline entrypoint."""
    g = _rng(8).integers(0, 256, (6, 5), dtype=np.uint8)
    out = im.decode(png.encode(g), "png")
    np.testing.assert_array_equal(out, np.repeat(g[:, :, None], 3, 2))
    assert im.sniff_format(png.encode(g)) == "png"
    # engine RGB8 payloads still roundtrip byte-exactly
    img = _rng(9).integers(0, 256, (12, 12, 3), dtype=np.uint8)
    np.testing.assert_array_equal(im.decode(im.encode(img, "png"), "png"),
                                  img)
