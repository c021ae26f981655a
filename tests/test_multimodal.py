"""Multimodal stub-stage plumbing tests (schemas, actor pools, layout).

The decode bodies are deterministic fakes (no audio/video libs in this
sandbox — see stages/multimodal.py); what these tests pin down is the
REAL part: Arrow schemas, actor-pool batch signatures, flat-map row
explosion, and the NotImplementedError contract for the non-fake path.
"""

import numpy as np
import pyarrow as pa
import pytest


def _audio_table(n=6):
    return pa.table({
        "clip_id": pa.array([f"clip-{i}" for i in range(n)], pa.string()),
        "bytes": pa.array([bytes([i]) * 64 for i in range(n)], pa.binary()),
        "sample_rate": pa.array([16000] * n, pa.int32()),
        "n_samples": pa.array([800 + 10 * i for i in range(n)], pa.int64()),
        "codec": pa.array(["fake"] * n, pa.string()),
    })


def _video_table(n=4):
    return pa.table({
        "video_id": pa.array([f"vid-{i}" for i in range(n)], pa.string()),
        "bytes": pa.array([bytes([i]) * 256 for i in range(n)], pa.binary()),
        "w": pa.array([32] * n, pa.int32()),
        "h": pa.array([24] * n, pa.int32()),
        "fps": pa.array([30.0] * n, pa.float64()),
        "n_frames": pa.array([90 + i for i in range(n)], pa.int32()),
        "codec": pa.array(["fake"] * n, pa.string()),
    })


def test_audio_features_actor_pool(ray_session):
    import ray.data

    from hand_index_ray.stages.multimodal import AUDIO_SCHEMA, AudioFeatures

    tbl = _audio_table()
    assert tbl.schema.equals(AUDIO_SCHEMA)
    ds = ray.data.from_arrow(tbl)
    out = ds.map_batches(AudioFeatures, fn_constructor_kwargs={"n_mel": 8},
                         batch_format="pyarrow", batch_size=2,
                         concurrency=2).to_pandas()
    assert len(out) == 6
    assert all(len(v) == 8 for v in out["features"])
    # deterministic: same run twice, same features
    out2 = ds.map_batches(AudioFeatures, fn_constructor_kwargs={"n_mel": 8},
                          batch_format="pyarrow", batch_size=2,
                          concurrency=2).to_pandas()
    a = np.stack(out.sort_values("clip_id")["features"].to_numpy())
    b = np.stack(out2.sort_values("clip_id")["features"].to_numpy())
    np.testing.assert_array_equal(a, b)


def test_frame_sampler_explodes_rows(ray_session):
    import ray.data

    from hand_index_ray.stages.multimodal import VIDEO_SCHEMA, FrameSampler

    tbl = _video_table()
    assert tbl.schema.equals(VIDEO_SCHEMA)
    out = (ray.data.from_arrow(tbl)
           .map_batches(FrameSampler, fn_constructor_kwargs={"k": 3},
                        batch_format="pyarrow", batch_size=2, concurrency=2)
           .to_pandas())
    assert len(out) == 4 * 3
    assert set(out.columns) == {"video_id", "frame_idx", "frame_phash"}
    assert out.groupby("video_id").size().eq(3).all()


def test_real_codec_path_raises():
    from hand_index_ray.stages.multimodal import AudioFeatures, FrameSampler

    with pytest.raises(NotImplementedError):
        AudioFeatures(fake=False)._decode(b"xx", "opus", 100)
    with pytest.raises(NotImplementedError):
        FrameSampler(fake=False)._decode_frame(b"xx", 0, 8, 8)


# --- real from-spec codecs: RIFF/WAVE (audio) and Y4M (video) -----------


def test_wav_roundtrip_bit_exact_16():
    from hand_index_ray.kernels.audio import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    x = np.round(rng.uniform(-1, 1, 500) * 32767) / 32768.0
    out, rate = decode_wav(encode_wav(x, 22050, bits=16))
    assert rate == 22050
    np.testing.assert_allclose(out, x, atol=0)


@pytest.mark.parametrize("bits", [8, 24, 32])
def test_wav_bit_depths(bits):
    from hand_index_ray.kernels.audio import decode_wav, encode_wav

    rng = np.random.default_rng(bits)
    x = rng.uniform(-0.99, 0.99, 300)
    out, rate = decode_wav(encode_wav(x, 8000, bits=bits))
    tol = {8: 1 / 128, 24: 1 / 8388608, 32: 1e-7}[bits]
    assert rate == 8000
    np.testing.assert_allclose(out, x, atol=tol)


def test_wav_stereo_downmix_and_malformed():
    from hand_index_ray.kernels.audio import decode_wav, encode_wav

    st = np.stack([np.full(100, 0.5), np.full(100, -0.25)], axis=1)
    out, _ = decode_wav(encode_wav(st, 16000, bits=16, channels=2))
    np.testing.assert_allclose(out, 0.125, atol=1 / 32768)
    with pytest.raises(ValueError):
        decode_wav(b"nope")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data


def test_audio_features_real_wav_path(ray_session):
    import ray.data

    from hand_index_ray.kernels.audio import encode_wav
    from hand_index_ray.stages.multimodal import AudioFeatures

    rng = np.random.default_rng(9)
    blobs, rms = [], []
    for i in range(4):
        amp = 0.1 * (i + 1)
        x = amp * np.sin(np.linspace(0, 40 * np.pi, 1600))
        blobs.append(encode_wav(x, 16000, bits=16))
        rms.append(amp / np.sqrt(2))
    tbl = pa.table({
        "clip_id": pa.array([f"c{i}" for i in range(4)], pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "sample_rate": pa.array([16000] * 4, pa.int32()),
        "n_samples": pa.array([1600] * 4, pa.int64()),
        "codec": pa.array(["wav"] * 4, pa.string()),
    })
    # fake=False: the wav path is REAL — no NotImplementedError
    out = (ray.data.from_arrow(tbl)
           .map_batches(AudioFeatures, fn_constructor_kwargs={"n_mel": 4, "fake": False},
                        batch_format="pyarrow", batch_size=2, concurrency=2)
           .to_pandas().sort_values("clip_id"))
    feats = np.stack(out["features"].to_numpy())
    # band energies of a sine ≈ overall RMS per band
    np.testing.assert_allclose(feats.mean(axis=1), rms, rtol=0.05)


def test_y4m_roundtrip_c444_and_c420():
    from hand_index_ray.kernels.image import psnr
    from hand_index_ray.kernels.video import (count_y4m_frames,
                                              decode_y4m_frame, encode_y4m)

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(5, 24, 32, 3), dtype=np.uint8)
    buf = encode_y4m(frames, fps=25.0, colorspace="C444")
    assert count_y4m_frames(buf) == 5
    for i in (0, 2, 4):
        got = decode_y4m_frame(buf, i)
        assert psnr(got, frames[i]) > 45.0  # rounding-only loss
    buf420 = encode_y4m(frames, colorspace="C420jpeg")
    got = decode_y4m_frame(buf420, 3)
    assert got.shape == (24, 32, 3)  # chroma-subsampled but decodable
    with pytest.raises(ValueError):
        decode_y4m_frame(buf, 99)
    with pytest.raises(ValueError):
        decode_y4m_frame(b"nope", 0)


def test_frame_sampler_real_y4m_path(ray_session):
    import ray.data

    from hand_index_ray.kernels.image import phash64
    from hand_index_ray.kernels.video import decode_y4m_frame, encode_y4m

    from hand_index_ray.stages.multimodal import FrameSampler

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, size=(9, 16, 16, 3), dtype=np.uint8)
    buf = encode_y4m(frames, colorspace="C444")
    tbl = pa.table({
        "video_id": pa.array(["v0"], pa.string()),
        "bytes": pa.array([buf], pa.binary()),
        "w": pa.array([16], pa.int32()),
        "h": pa.array([16], pa.int32()),
        "fps": pa.array([30.0], pa.float64()),
        "n_frames": pa.array([9], pa.int32()),
        "codec": pa.array(["y4m"], pa.string()),
    })
    out = (ray.data.from_arrow(tbl)
           .map_batches(FrameSampler, fn_constructor_kwargs={"k": 3, "fake": False},
                        batch_format="pyarrow", batch_size=1, concurrency=1)
           .to_pandas().sort_values("frame_idx"))
    assert list(out["frame_idx"]) == [0, 4, 8]
    want = [int(phash64(decode_y4m_frame(buf, i))) for i in (0, 4, 8)]
    got = [int(np.uint64(v)) for v in out["frame_phash"].to_numpy().astype(np.uint64)]
    assert got == want


def test_wht_batch_matches_popcount_definition():
    from hand_index_ray.kernels.audio import wht_batch

    rng = np.random.default_rng(0)
    x = rng.integers(-50, 50, (3, 64))
    C = wht_batch(x)
    t = np.arange(64)

    def pop(a):
        return sum((a >> i) & 1 for i in range(7))

    for j in [0, 1, 8, 21, 33, 63]:
        sign = 1 - 2 * (pop(t & j) % 2)
        assert (C[:, j] == (x * sign).sum(axis=1)).all()
    # Parseval: sum C^2 = N * sum x^2
    assert ((C ** 2).sum(axis=1) == 64 * (x ** 2).sum(axis=1)).all()


def test_wht_batch_rejects_non_power_of_two():
    from hand_index_ray.kernels.audio import wht_batch

    with pytest.raises(ValueError):
        wht_batch(np.zeros((2, 48)))
