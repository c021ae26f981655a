"""Remote-filesystem end-to-end (ST4, VERDICT r2 'what's missing' 3):
drive build → compact → gc → sidecars → bbox query entirely through a
non-local ``pyarrow.fs`` handle.

The filesystem is a SubTreeFileSystem rooted at a scratch dir, posing
as a bucket: every path the engine sees is a bucket-style key like
``index/cell=.../frag-000000.parquet`` that does NOT exist relative to
the process cwd — so if any stage touched the data root with
``os.listdir`` / ``open`` / ``os.replace`` instead of the fs handle,
it would fail with FileNotFoundError. (Reference parity: load.py
natively takes s3:// roots, load.py:327-341.)"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyarrow import fs as pafs

from hand_index_ray.config import EngineConfig
from hand_index_ray.sources import synth


@pytest.fixture(scope="module")
def bucket(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fake-bucket"))
    return root, pafs.SubTreeFileSystem(root, pafs.LocalFileSystem())


CFG = EngineConfig(decode_batch_size=256, part_level=6,
                   max_files_per_fragment=4)


def _write_images(root: str, n_frag: int = 3, rows: int = 120):
    """Input fragments written THROUGH local fs into the bucket dir
    (fixture setup may touch the real path; the engine may not)."""
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    per = rows // n_frag
    for f in range(n_frag):
        tbl = pa.Table.from_pylist(
            [synth.image_row(i) for i in range(f * per, (f + 1) * per)])
        pq.write_table(tbl, os.path.join(root, "images",
                                         f"frag-{f:04d}.parquet"))
    return per * n_frag


def test_remote_fs_end_to_end(ray_session, bucket):
    root, fs = bucket
    total = _write_images(root)

    from hand_index_ray.pipelines.build import (build_index, compact_index,
                                                gc_index)
    from hand_index_ray.pipelines.query import bbox_scan
    from hand_index_ray.state.manifest import Manifest

    # 1. build through the fs handle, bucket-style keys only
    stats = build_index("images", "index", cfg=CFG,
                        filesystem=fs, out_filesystem=fs)
    assert stats["fragments_built"] == 3
    assert stats["rows_total"] == total
    assert not os.path.exists("index"), "engine resolved keys locally!"
    assert os.path.isdir(os.path.join(root, "index", "_manifest"))

    # 2. resume: records present → nothing rebuilt
    stats2 = build_index("images", "index", cfg=CFG,
                         filesystem=fs, out_filesystem=fs)
    assert stats2["fragments_built"] == 0
    assert stats2["fragments_skipped_resume"] == 3

    # 3. kill-resume: drop one manifest record (simulates a fragment
    #    killed before its completion marker) → exactly it rebuilds
    victim = os.path.join(root, "index", "_manifest", "frag-000001.json")
    os.unlink(victim)
    stats3 = build_index("images", "index", cfg=CFG,
                         filesystem=fs, out_filesystem=fs)
    assert stats3["fragments_built"] == 1

    # 4. compact + gc through the fs handle
    c = compact_index("index", cfg=CFG, filesystem=fs)
    assert c["files_merged"] > 0
    g = gc_index("index", filesystem=fs)
    assert g["files_removed"] >= 0
    man = Manifest("index", filesystem=fs)
    files = man.all_files("index")
    assert files and all(f.startswith("index/") for f in files)
    assert all("compacted-g" in f for f in files)

    # 5. queries through the fs handle (manifest pruning + parquet read)
    ds = bbox_scan("index", -104.0, 33.0, -96.0, 39.0, filesystem=fs)
    assert ds is not None
    got = ds.to_pandas()
    assert len(got) > 0
    # every other index entry point takes the same handle
    from hand_index_ray.pipelines.query import (grid_heatmap,
                                                hex_cell_stats, knn_query,
                                                zone_extent)
    kn = knn_query("index", -98.0, 36.0, 5, CFG, filesystem=fs)
    assert len(kn) == 5
    hs = hex_cell_stats("index", 6, filesystem=fs).to_pandas()
    assert int(hs["n"].sum()) == total
    assert len(zone_extent("index", filesystem=fs).to_pandas()) > 0
    assert len(grid_heatmap("index", filesystem=fs).to_pandas()) > 0
    # oracle: same predicate over the raw footprints, locally
    from hand_index_ray.pipelines.build import footprint_dataset
    raw = footprint_dataset(
        sorted(os.path.join(root, "images", f)
               for f in os.listdir(os.path.join(root, "images"))),
        CFG).to_pandas()
    want = raw[(raw.minx <= -96.0) & (raw.maxx >= -104.0)
               & (raw.miny <= 39.0) & (raw.maxy >= 33.0)]
    assert sorted(got.image_id) == sorted(want.image_id)


def test_remote_fs_sidecars(ray_session, bucket):
    root, fs = bucket
    # a small fake HAND output tree + catchments table inside the bucket
    tree = os.path.join(root, "hand")
    for b in ("0", "1"):
        d = os.path.join(tree, "huc0001", "branches", b)
        os.makedirs(d, exist_ok=True)
        for name in (f"rem_zeroed_masked_{b}.tif",
                     f"gw_catchments_reaches_filtered_addedAttributes_{b}.tif",
                     f"hydroTable_{b}.csv"):
            with open(os.path.join(d, name), "w") as f:
                f.write("x")
    cat = pa.table({
        "catchment_id": pa.array(["c0", "c1"], pa.string()),
        "branch_path": pa.array(
            ["hand/huc0001/branches/0/", "hand/huc0001/branches/1/"],
            pa.string()),
    })
    pq.write_table(cat, os.path.join(root, "catchments.parquet"))

    from hand_index_ray.pipelines.sidecar import attach_sidecars
    out = attach_sidecars("hand", "catchments.parquet", out_dir="sidecars",
                          filesystem=fs, out_filesystem=fs)
    assert set(out) == {"hydrotables", "rem_rasters", "catchment_rasters"}
    assert not os.path.exists("sidecars")
    assert os.path.exists(os.path.join(root, "sidecars",
                                       "hydrotables.parquet"))
    ht = out["hydrotables"].to_pandas()
    assert len(ht) == 2 and set(ht.catchment_id) == {"c0", "c1"}
