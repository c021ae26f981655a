"""Session-scoped Ray + shared synthetic fixtures for engine tests."""

import os
import shutil

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    try:
        import ray.data
        ctx = ray.data.DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_dirs(tmp_path_factory):
    """Small deterministic images + catchments tables on disk."""
    from hand_index_ray.sources import synth

    root = tmp_path_factory.mktemp("hix")
    images = str(root / "images")
    vector = str(root / "vector")
    synth.write_images(images, n=400, fragments=8)
    synth.write_catchment_suite(vector, n=250)
    yield {"root": str(root), "images": images, "vector": vector}
    shutil.rmtree(str(root), ignore_errors=True)
