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
