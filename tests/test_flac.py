"""FLAC codec (kernels/flac.py) — from-spec pure-numpy compressed audio.

Round-trips are bit-exact (FLAC is lossless); decoder-only surfaces the
encoder never emits (LPC subframes, wasted bits, left/side right/side
stereo, escape partitions, rice2) are exercised with hand-crafted
frames built from the module's own bit-level helpers.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from hand_index_ray.kernels import flac as F


def _rng(seed=0):
    return np.random.default_rng(seed)


# --- CRC ----------------------------------------------------------------

def test_crc16_tree_fold_matches_scalar():
    rng = _rng(1)
    for n in (0, 1, 64, 65, 127, 128, 1000, 4097):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        c = 0
        for b in data:
            c = ((c << 8) & 0xFFFF) ^ int(F._CRC16_TBL[(c >> 8) ^ b])
        assert F.crc16(data) == c


def test_crc8_known_vector():
    # poly 0x07, init 0: published check value for "123456789" is 0xF4
    assert F.crc8(b"123456789") == 0xF4


def test_crc16_known_vector():
    # CRC-16/BUYPASS (poly 0x8005, init 0, no reflect): check = 0xFEE8
    assert F.crc16(b"123456789") == 0xFEE8


# --- encoder/decoder roundtrips ------------------------------------------

@pytest.mark.parametrize("n", [1, 3, 191, 192, 4095, 4096, 4097, 20000])
def test_roundtrip_mono_sizes(n):
    rng = _rng(n)
    x = rng.integers(-32768, 32768, n).astype(np.int64)
    out, rate, bits = F.decode_flac(F.encode_flac(x, 16000), verify_md5=True)
    assert (rate, bits) == (16000, 16)
    assert np.array_equal(out[:, 0], x)


def test_roundtrip_smooth_compresses():
    t = np.arange(40000)
    x = np.round(9000 * np.sin(t / 40) + 800 * np.sin(t / 5)).astype(np.int64)
    blob = F.encode_flac(x, 44100)
    assert len(blob) < 0.5 * 2 * len(x)  # real compression, not a container
    out, _, _ = F.decode_flac(blob, verify_md5=True)
    assert np.array_equal(out[:, 0], x)


@pytest.mark.parametrize("mode", ["independent", "mid_side"])
def test_roundtrip_stereo(mode):
    rng = _rng(7)
    base = np.round(5000 * np.sin(np.arange(9000) / 30)).astype(np.int64)
    st = np.stack([base, base + rng.integers(-40, 40, 9000)], axis=1)
    out, _, _ = F.decode_flac(F.encode_flac(st, 48000, stereo=mode),
                              verify_md5=True)
    assert np.array_equal(out, st)


def test_roundtrip_8bit_and_constant():
    rng = _rng(9)
    x8 = rng.integers(-128, 128, 2500).astype(np.int64)
    out, _, bits = F.decode_flac(F.encode_flac(x8, 8000, bits=8),
                                 verify_md5=True)
    assert bits == 8 and np.array_equal(out[:, 0], x8)
    c = np.full(5000, -77, np.int64)
    blob = F.encode_flac(c, 8000, bits=8)
    assert len(blob) < 200  # CONSTANT subframes
    out, _, _ = F.decode_flac(blob, verify_md5=True)
    assert np.array_equal(out[:, 0], c)


def test_extremes_and_range_check():
    x = np.array([-32768, 32767] * 300, np.int64)
    out, _, _ = F.decode_flac(F.encode_flac(x, 8000), verify_md5=True)
    assert np.array_equal(out[:, 0], x)
    with pytest.raises(ValueError, match="range"):
        F.encode_flac(np.array([40000]), 8000, bits=16)


def test_corruption_detected():
    x = _rng(3).integers(-1000, 1000, 6000).astype(np.int64)
    blob = bytearray(F.encode_flac(x, 16000))
    blob[len(blob) // 2] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        F.decode_flac(bytes(blob))
    with pytest.raises(ValueError, match="FLAC"):
        F.decode_flac(b"not a flac stream")


# --- hand-crafted decoder-only surfaces -----------------------------------

def _stream_header(rate, ch, bits, total, md5=b"\0" * 16, bs=4096):
    si = F._scalar_bits([(bs, 16), (bs, 16), (0, 24), (0, 24),
                         (rate, 20), (ch - 1, 3), (bits - 1, 5), (total, 36)])
    return (F.MAGIC + bytes([0x80]) + struct.pack(">I", 34)[1:]
            + np.packbits(si).tobytes() + md5)


def _frame(subframe_bits_list, bs, rate_code=5, chan_code=0, size_code=4,
           fi=0):
    hdr = bytearray(b"\xff\xf8")
    hdr.append((0b0111 << 4) | rate_code)
    hdr.append((chan_code << 4) | (size_code << 1))
    hdr += F._utf8_number(fi)
    hdr += struct.pack(">H", bs - 1)
    hdr.append(F.crc8(bytes(hdr)))
    segs = [np.unpackbits(np.frombuffer(bytes(hdr), np.uint8))]
    segs += subframe_bits_list
    allbits = np.concatenate(segs)
    pad = (-len(allbits)) % 8
    if pad:
        allbits = np.concatenate([allbits, np.zeros(pad, np.uint8)])
    body = np.packbits(allbits).tobytes()
    return body + struct.pack(">H", F.crc16(body))


def test_lpc_subframe_decode():
    """LPC order-2 with coefs (3, -1), shift 1: x_i = (3x_{i-1} - x_{i-2})>>1 + r_i."""
    rng = _rng(11)
    n, order, shift = 600, 2, 1
    coefs = np.array([3, -1], np.int64)  # c[0] applies to x_{i-1}
    res = rng.integers(-60, 60, n - order).astype(np.int64)
    x = np.zeros(n, np.int64)
    x[0], x[1] = 100, 140
    for i in range(order, n):
        x[i] = ((coefs[0] * x[i - 1] + coefs[1] * x[i - 2]) >> shift) + res[i - order]
    assert np.abs(x).max() < 32768
    k = F._best_rice_k(res)
    sub = np.concatenate([
        F._scalar_bits([(0, 1), (0b100000 | (order - 1), 6), (0, 1)]),
        F._fixed_bits(x[:order], 16),
        F._scalar_bits([(4, 4), (shift, 5)]),   # precision-1=4 → 5-bit coefs
        F._fixed_bits(coefs, 5),
        F._scalar_bits([(0, 2), (0, 4), (k, 4)]),
        F._rice_bits(res, k),
    ])
    blob = _stream_header(16000, 1, 16, n) + _frame([sub], n)
    out, _, _ = F.decode_flac(blob)
    assert np.array_equal(out[:, 0], x)


def test_wasted_bits_decode():
    """Verbatim subframe with 2 wasted bits: stored at 14 bits, output <<2."""
    rng = _rng(13)
    n = 300
    x = (rng.integers(-4096, 4096, n) << 2).astype(np.int64)
    sub = np.concatenate([
        F._scalar_bits([(0, 1), (0b000001, 6), (1, 1), (0, 1), (1, 1)]),
        F._fixed_bits(x >> 2, 14),  # unary "01" → 2 wasted bits
    ])
    blob = _stream_header(8000, 1, 16, n) + _frame([sub], n)
    out, _, _ = F.decode_flac(blob)
    assert np.array_equal(out[:, 0], x)


@pytest.mark.parametrize("chan_code", [8, 9])
def test_left_side_right_side_decode(chan_code):
    rng = _rng(chan_code)
    n = 700
    left = np.round(3000 * np.sin(np.arange(n) / 20)).astype(np.int64)
    right = left + rng.integers(-30, 30, n)
    side = left - right
    if chan_code == 8:   # left/side: subframe0=left(16b), subframe1=side(17b)
        subs = [F._encode_subframe(left, 16, 2), F._encode_subframe(side, 17, 2)]
    else:                # right/side: subframe0=side(17b), subframe1=right(16b)
        subs = [F._encode_subframe(side, 17, 2), F._encode_subframe(right, 16, 2)]
    blob = _stream_header(16000, 2, 16, n) + _frame(subs, n, chan_code=chan_code)
    out, _, _ = F.decode_flac(blob)
    assert np.array_equal(out[:, 0], left)
    assert np.array_equal(out[:, 1], right)


def test_escape_partition_and_rice2_decode():
    rng = _rng(17)
    n = 256
    x = rng.integers(-2000, 2000, n).astype(np.int64)
    # FIXED order 0 → residual == x; method 01 (rice2, 5-bit params),
    # partition order 1: partition 0 rice2 k, partition 1 escape @ 13 bits
    half = n // 2
    k = F._best_rice_k(x[:half])
    sub = np.concatenate([
        F._scalar_bits([(0, 1), (0b001000, 6), (0, 1)]),
        F._scalar_bits([(1, 2), (1, 4)]),
        F._scalar_bits([(k, 5)]), F._rice_bits(x[:half], k),
        F._scalar_bits([(0b11111, 5), (13, 5)]), F._fixed_bits(x[half:], 13),
    ])
    blob = _stream_header(16000, 1, 16, n) + _frame([sub], n)
    out, _, _ = F.decode_flac(blob)
    assert np.array_equal(out[:, 0], x)


def test_fixed_orders_3_4_decode():
    """Encoder picks orders 0-2; orders 3-4 are decoder-only — craft them."""
    rng = _rng(19)
    n = 500
    for order in (3, 4):
        x = np.cumsum(np.cumsum(np.cumsum(rng.integers(-2, 3, n)))).astype(np.int64)
        x = np.clip(x, -30000, 30000)
        res = np.diff(x, n=order)
        k = F._best_rice_k(res)
        sub = np.concatenate([
            F._scalar_bits([(0, 1), (0b001000 | order, 6), (0, 1)]),
            F._fixed_bits(x[:order], 16),
            F._scalar_bits([(0, 2), (0, 4), (k, 4)]),
            F._rice_bits(res, k),
        ])
        blob = _stream_header(16000, 1, 16, n) + _frame([sub], n)
        out, _, _ = F.decode_flac(blob)
        assert np.array_equal(out[:, 0], x), order


# --- stage integration -----------------------------------------------------

def test_audio_features_real_flac_path(ray_session):
    import ray

    from hand_index_ray.stages.multimodal import AudioFeatures

    rng = _rng(23)
    blobs, expect = [], []
    for i in range(4):
        x = np.round(6000 * np.sin(np.arange(2000 + 13 * i) / (10 + i))).astype(np.int64)
        blobs.append(F.encode_flac(x, 16000))
        expect.append(x / 32768.0)
    tbl = pa.table({
        "clip_id": pa.array([f"c{i}" for i in range(4)], pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "sample_rate": pa.array([16000] * 4, pa.int32()),
        "n_samples": pa.array([len(e) for e in expect], pa.int64()),
        "codec": pa.array(["flac"] * 4, pa.string()),
    })
    # fake=False: the flac path is REAL — no NotImplementedError
    out = (ray.data.from_arrow(tbl)
           .map_batches(AudioFeatures,
                        fn_constructor_kwargs={"n_mel": 4, "fake": False},
                        batch_format="pyarrow", concurrency=1)
           .to_pandas().set_index("clip_id"))
    for i, e in enumerate(expect):
        bands = np.array_split(e, 4)
        want = [np.sqrt(np.mean(b * b)) for b in bands]
        np.testing.assert_allclose(out.loc[f"c{i}", "features"], want,
                                   rtol=1e-12)


def test_decode_throughput_vectorized():
    """The rice orbit must not degrade to per-sample Python: decoding
    100k samples should take well under a second even on a loaded host."""
    import time

    x = np.round(10000 * np.sin(np.arange(100_000) / 35)).astype(np.int64)
    blob = F.encode_flac(x, 44100)
    F.decode_flac(blob)  # warm
    t0 = time.perf_counter()
    out, _, _ = F.decode_flac(blob)
    dt = time.perf_counter() - t0
    assert np.array_equal(out[:, 0], x)
    assert dt < 2.0, f"decode too slow: {dt:.2f}s for 100k samples"
