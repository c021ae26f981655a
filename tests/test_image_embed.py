"""Image resize/embedding pipeline tests."""

import numpy as np
import pytest

from hand_index_ray.kernels import image as imk


def test_resize_box_exact_downscale():
    # constant blocks → exact block values after resize
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:4, :4] = 10
    img[:4, 4:] = 20
    img[4:, :4] = 30
    img[4:, 4:] = 40
    out = imk.resize_box(img, 2, 2)
    assert out.shape == (2, 2, 3)
    np.testing.assert_array_equal(out[0, 0], [10] * 3)
    np.testing.assert_array_equal(out[0, 1], [20] * 3)
    np.testing.assert_array_equal(out[1, 0], [30] * 3)
    np.testing.assert_array_equal(out[1, 1], [40] * 3)
    # non-divisible sizes also work
    out2 = imk.resize_box(np.full((10, 7, 3), 99, np.uint8), 3, 3)
    assert out2.shape == (3, 3, 3)
    np.testing.assert_array_equal(out2, np.full((3, 3, 3), 99))


def test_embed_tile_metric_behavior():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    # lossy re-encode of a → cosine ≈ 1
    a2 = imk.decode(imk.encode(a, "qjpg"), "qjpg")
    b = np.ascontiguousarray(np.rot90(a))
    ea, ea2, eb = (imk.embed_tile(x) for x in (a, a2, b))
    assert float(ea @ ea2) > 0.99
    assert float(ea @ eb) < float(ea @ ea2)
    assert abs(np.linalg.norm(ea) - 1) < 1e-12


def test_embed_images_and_duplicate_tiles(ray_session, smoke_dirs):
    from hand_index_ray.config import EngineConfig
    from hand_index_ray.pipelines.image_embed import duplicate_tiles, embed_images

    cfg = EngineConfig(encode_concurrency=2, decode_batch_size=64)
    emb = embed_images(smoke_dirs["images"], cfg=cfg).to_pandas()
    assert len(emb) == 400
    assert all(len(v) == 48 for v in emb["embedding"])  # 4*4*3
    pairs = duplicate_tiles(smoke_dirs["images"], threshold=0.9999, cfg=cfg).to_pandas()
    # the fixture plants ~1% duplicated-pixel rows (synth.DUP_FRAC):
    # each duplicate row i reuses row i-1's pixels → adjacent-id pairs
    assert len(pairs) >= 1
    adj = [(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])
           if int(b[4:]) - int(a[4:]) == 1]
    assert len(adj) >= 1
    assert (pairs["sim"] >= 0.9999).all()
