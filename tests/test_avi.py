"""MJPEG AVI codec (kernels/avi.py) — real compressed video through the
from-spec RIFF container + baseline JPEG entropy coding."""

import numpy as np
import pyarrow as pa
import pytest

from hand_index_ray.kernels import avi, jpeg


def _const_block_frames(seed=1, n=4, hw=16):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, (n, hw // 8, hw // 8), dtype=np.uint8)
    return np.repeat(np.repeat(vals, 8, 1), 8, 2)


def test_roundtrip_constant_blocks_bit_exact():
    frames = _const_block_frames()
    blob = avi.encode_avi_mjpeg(frames, fps=24.0, quality=100)
    meta = avi.parse_avi(blob)
    assert (meta["w"], meta["h"], meta["n_frames"]) == (16, 16, 4)
    assert meta["fps"] == pytest.approx(24.0)  # strh rational, exact
    out = avi.decode_avi_frames(blob)
    assert all(np.array_equal(o, f) for o, f in zip(out, frames))


def test_rgb_lossy_psnr():
    rng = np.random.default_rng(2)
    # smooth gradient content — realistic for PSNR at q95
    y, x = np.mgrid[0:32, 0:32]
    base = ((y * 3 + x * 5) % 256).astype(np.uint8)
    frames = np.stack([np.stack([base + i, base, base - i], axis=-1)
                       for i in range(3)]).astype(np.uint8)
    blob = avi.encode_avi_mjpeg(frames, quality=95)
    out = avi.decode_avi_frames(blob)
    for o, f in zip(out, frames):
        mse = np.mean((o.astype(np.float64) - f) ** 2)
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
        assert psnr >= 40.0, psnr
    del rng


def test_frame_seek_is_chunk_scan():
    """Sampling frames must not decode unsampled ones: extract blobs,
    decode only the requested subset, results match full decode."""
    frames = _const_block_frames(seed=3, n=8)
    blob = avi.encode_avi_mjpeg(frames, quality=100)
    blobs = avi.extract_frame_blobs(blob, [1, 6])
    assert all(jpeg.is_jpeg(b) for b in blobs)
    dec = jpeg.decode_batch(blobs)
    assert np.array_equal(dec[0], frames[1])
    assert np.array_equal(dec[1], frames[6])
    with pytest.raises(IndexError):
        avi.extract_frame_blobs(blob, [8])


def test_rejects_non_mjpeg_and_garbage():
    frames = _const_block_frames(n=2)
    blob = bytearray(avi.encode_avi_mjpeg(frames))
    i = blob.index(b"vids") + 4
    blob[i:i + 4] = b"H264"
    with pytest.raises(ValueError, match="fourcc"):
        avi.parse_avi(bytes(blob))
    with pytest.raises(ValueError, match="AVI"):
        avi.parse_avi(b"RIFFxxxxWAVE")
    assert not avi.is_avi(b"\xff\xd8\xff")


def test_frame_sampler_mjpeg_pooled_decode(ray_session):
    import ray

    from hand_index_ray.stages.multimodal import FrameSampler

    blobs, metas = [], []
    for i in range(3):
        frames = _const_block_frames(seed=10 + i, n=5)
        blobs.append(avi.encode_avi_mjpeg(frames, quality=100))
        metas.append(frames)
    tbl = pa.table({
        "video_id": pa.array([f"v{i}" for i in range(3)], pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array([16] * 3, pa.int32()),
        "h": pa.array([16] * 3, pa.int32()),
        "fps": pa.array([24.0] * 3, pa.float64()),
        "n_frames": pa.array([5] * 3, pa.int32()),
        "codec": pa.array(["mjpeg"] * 3, pa.string()),
    })
    # fake=False: MJPEG is a REAL path now
    out = (ray.data.from_arrow(tbl)
           .map_batches(FrameSampler, fn_constructor_kwargs={"k": 3, "fake": False},
                        batch_format="pyarrow", concurrency=1)
           .to_pandas())
    assert len(out) == 9
    from hand_index_ray.kernels.image import phash_and_graymean_batch
    for i in range(3):
        picks = np.linspace(0, 4, 3).astype(int)
        want_imgs = np.stack([np.stack([metas[i][f]] * 3, -1) for f in picks])
        want_ph, _ = phash_and_graymean_batch(want_imgs)
        got = out[out.video_id == f"v{i}"].sort_values("frame_idx")
        assert list(got.frame_idx) == list(picks)
        assert list(got.frame_phash) == [int(np.int64(p)) for p in want_ph.astype(np.int64)]
