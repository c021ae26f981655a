"""Progressive JPEG (kernels/jpeg_progressive.py) — Annex-G scans.

The consistency proof: progressive and baseline encoders share the
forward transform (identical quantized coefficients), so progressive
decode must reproduce the BASELINE decode of the same image bit-exactly
— any asymmetric misunderstanding of the Annex-G entropy coding breaks
the equality.
"""

import numpy as np
import pytest

from hand_index_ray.kernels import jpeg
from hand_index_ray.kernels.jpeg_progressive import (
    build_optimal_huffman, decode_progressive, encode_progressive,
    is_progressive)
from hand_index_ray.sources.synth import make_pixels


@pytest.mark.parametrize("w,h,sub,gray,q", [
    (64, 64, False, False, 90),
    (64, 64, True, False, 90),   # 4:2:0
    (24, 17, False, False, 75),  # non-multiple-of-8 dims
    (24, 17, True, False, 85),   # odd dims + subsampling (dummy blocks)
    (40, 40, False, True, 95),   # grayscale
    (8, 8, False, False, 98),
    (96, 64, False, False, 50),  # coarse quant → long EOB runs
    (13, 9, False, True, 60),
])
def test_progressive_equals_baseline_pipeline(w, h, sub, gray, q):
    px = make_pixels(3, w, h)
    if gray:
        px = px[..., 0]
    prog = encode_progressive(px, quality=q, subsample=sub)
    base = jpeg.encode(px, quality=q, subsample=sub)
    assert is_progressive(prog) and not is_progressive(base)
    assert np.array_equal(decode_progressive(prog), jpeg.decode(base))


def test_decode_routes_progressive():
    px = make_pixels(5, 32, 32)
    prog = encode_progressive(px, 90)
    # scalar decode() and the lockstep batch path both ingest SOF2
    assert np.array_equal(jpeg.decode(prog), decode_progressive(prog))
    out = jpeg.decode_batch([jpeg.encode(px, 90, restart_mcus=1), prog,
                             b"\xff\xd8\xffzz"], strict=False)
    assert np.array_equal(out[0], jpeg.decode(jpeg.encode(px, 90, restart_mcus=1)))
    assert np.array_equal(out[1], decode_progressive(prog))
    assert out[2] is None
    # strict batches must not die on a valid progressive member
    out2 = jpeg.decode_batch([prog], strict=True)
    assert np.array_equal(out2[0], decode_progressive(prog))


def test_progressive_smaller_than_baseline():
    """Optimized per-scan Huffman + spectral ordering should beat the
    baseline's fixed Annex-K tables on typical content."""
    px = make_pixels(11, 64, 64)
    assert len(encode_progressive(px, 90)) < len(jpeg.encode(px, 90))


def test_constant_blocks_bit_exact_q100():
    rng = np.random.default_rng(4)
    vals = rng.integers(0, 256, (2, 2), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    px = np.stack([img] * 3, -1)
    assert np.array_equal(decode_progressive(encode_progressive(px, 100)), px)


def test_optimal_huffman_is_valid_prefix_code():
    rng = np.random.default_rng(9)
    for trial in range(4):
        freq = np.zeros(256, np.int64)
        syms = rng.integers(0, 256, 50)
        freq[syms] += rng.integers(1, 1000, 50)
        bits, vals = build_optimal_huffman(freq)
        assert sum(bits) == len(vals) == len(np.flatnonzero(freq))
        # Kraft sum < 1 (strict: the reserved symbol's slot stays free)
        kraft = sum(n / (1 << (ln + 1 - 1)) for ln, n in
                    zip(range(1, 17), bits) for _ in [0] if n) or 0
        kraft = sum(b / (1 << ln) for ln, b in zip(range(1, 17), bits))
        assert kraft < 1.0
        assert all(1 <= ln <= 16 for ln, b in zip(range(1, 17), bits) if b)


def test_corrupt_progressive_rejected():
    px = make_pixels(2, 32, 32)
    blob = bytearray(encode_progressive(px, 90))
    blob[-40] ^= 0x55  # corrupt late entropy data
    try:
        out = decode_progressive(bytes(blob))
        # corruption in refinement bits may decode to wrong-but-valid
        # pixels; equality with the pristine decode must break
        assert not np.array_equal(out, decode_progressive(
            encode_progressive(px, 90)))
    except (ValueError, IndexError):
        pass  # detected outright
