"""ORC/Feather sharded interchange (sources/columnar.py; q173)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

from hand_index_ray.sources import columnar as col


@pytest.fixture(scope="module")
def src_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    return ray.data.from_arrow(pa.table({
        "k": np.arange(1000, dtype=np.int64),
        "v": rng.integers(0, 100, 1000),
        "s": pa.array([f"row{i}" for i in range(1000)], pa.string()),
    })).repartition(4)


@pytest.mark.parametrize("fmt,ext", [("orc", "orc"), ("feather", "feather")])
def test_roundtrip_sharded(tmp_path, src_ds, fmt, ext):
    out = str(tmp_path / fmt)
    manifest = col.write_shards(src_ds, out, fmt).to_pandas()
    assert manifest["rows"].sum() == 1000
    paths = sorted(glob.glob(os.path.join(out, f"*.{ext}")))
    assert len(paths) == len(manifest)
    back = col.read_shards(paths, fmt).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    orig = src_ds.to_pandas().sort_values("k").reset_index(drop=True)
    assert back.equals(orig)


def test_column_pruning(tmp_path, src_ds):
    out = str(tmp_path / "orc")
    col.write_shards(src_ds, out, "orc").materialize()
    paths = glob.glob(os.path.join(out, "*.orc"))
    pruned = col.read_shards(paths, "orc", columns=["k"])
    assert pruned.schema().names == ["k"]
    assert pruned.count() == 1000


def test_bad_format_raises(src_ds):
    with pytest.raises(ValueError):
        col.read_shards([], "avro-nope")
