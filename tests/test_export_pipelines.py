"""Export pipelines: MVT tile export + LAS gridding (library + CLI)."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hand_index_ray.kernels import mvt, wkb
from hand_index_ray.sources import las


def _sq_wkb(x0, y0, s):
    return wkb.encode_box(np.array([x0], float), np.array([y0], float),
                          np.array([x0 + s], float),
                          np.array([y0 + s], float))[0]


def _catchments_table(n=40):
    rng = np.random.default_rng(5)
    xs = rng.integers(0, 900, n)
    ys = rng.integers(0, 900, n)
    return pa.table({
        "catchment_id": pa.array([f"c{i}" for i in range(n)]),
        "geometry": pa.array([_sq_wkb(int(x), int(y), 20)
                              for x, y in zip(xs, ys)], pa.binary()),
    }), xs, ys


def test_export_mvt_roundtrip(tmp_path, ray_session):
    import ray.data

    from hand_index_ray.pipelines.vector_tiles import export_mvt

    tbl, xs, ys = _catchments_table()
    out = str(tmp_path / "tiles")
    manifest = export_mvt(ray.data.from_arrow(tbl), out, grid=4)
    assert manifest.n_features.sum() == 40
    # every manifest path exists and decodes with the right count
    total = 0
    for _, row in manifest.iterrows():
        layers = mvt.decode_tile(open(row.path, "rb").read())
        assert layers[0]["name"] == "features"
        assert len(layers[0]["features"]) == row.n_features
        total += row.n_features
        for f in layers[0]["features"]:
            # centers are in-tile; geometry may spill past the tile
            # edge (MVT's buffer convention) but stays near it
            assert f["geometry"][0][0][:, 0].min() >= -4096
            assert f["geometry"][0][0][:, 0].max() <= 2 * 4096
    assert total == 40


def test_grid_las(tmp_path, ray_session):
    from hand_index_ray.pipelines.pointcloud import grid_las

    p = str(tmp_path / "pts.las")
    # 3 cells with known means
    xi = np.array([10, 20, 510, 520, 530, 1010])
    yi = np.array([10, 20, 10, 20, 30, 10])
    zi = np.array([100, 200, 30, 60, 90, 7])
    las.write_las(p, xi, yi, zi)
    out = str(tmp_path / "dem.tif")
    stats = grid_las(p, out, cell_size=500)
    assert stats["filled_cells"] == 3 and stats["points"] == 6
    from hand_index_ray.kernels.geotiff import decode_geotiff
    dem, _ = decode_geotiff(open(out, "rb").read())
    assert dem[0, 0] == 150 and dem[0, 1] == 60 and dem[0, 2] == 7


def test_cli_export_and_grid(tmp_path):
    tbl, _, _ = _catchments_table(12)
    cat = str(tmp_path / "cat.parquet")
    pq.write_table(tbl, cat)
    lasf = str(tmp_path / "p.las")
    las.write_las(lasf, [10, 600], [5, 5], [40, 80])
    env = dict(os.environ, PYTHONPATH="/root/repo", RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, "-m", "hand_index_ray", "export-mvt",
         "--catchments", cat, "--out-dir", str(tmp_path / "t"),
         "--grid", "2"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["features"] == 12
    r2 = subprocess.run(
        [sys.executable, "-m", "hand_index_ray", "grid-las",
         "--las", lasf, "--out", str(tmp_path / "o.tif"),
         "--cell-size", "500"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=240)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert json.loads(r2.stdout.strip().splitlines()[-1])["filled_cells"] == 2


def test_pyramid_reduce_sparse_and_sums(ray_session):
    import ray.data

    from hand_index_ray.pipelines import raster as rst

    # sparse coverage: only 2 of 4 children of parent (0,0); one child
    # of parent (1,1)
    tiles = [(3, 0, 0), (3, 1, 1), (3, 2, 3)]
    rows = {"z": [], "tx": [], "ty": [], "px": []}
    rng = np.random.default_rng(4)
    pix = {}
    for z, tx, ty in tiles:
        v = rng.integers(0, 255, (8, 8)).astype(np.int64)
        pix[(tx, ty)] = v
        rows["z"].append(z)
        rows["tx"].append(tx)
        rows["ty"].append(ty)
        rows["px"].append(v.reshape(-1).tolist())
    ds = ray.data.from_arrow(pa.table({
        "z": pa.array(rows["z"], pa.int64()),
        "tx": pa.array(rows["tx"], pa.int64()),
        "ty": pa.array(rows["ty"], pa.int64()),
        "px": pa.array(rows["px"], pa.list_(pa.int64()))}))
    out = rst.pyramid_reduce(ds, tile_px=8).to_pandas() \
        .sort_values(["tx", "ty"]).reset_index(drop=True)
    assert out["z"].tolist() == [2, 2]
    assert out[["tx", "ty"]].values.tolist() == [[0, 0], [1, 1]]
    p00 = np.asarray(out["px"][0], np.int64).reshape(8, 8)
    # child (0,0) occupies the top-left quadrant, child (1,1) the
    # bottom-right; the two missing quadrants are zero
    d00 = pix[(0, 0)].reshape(4, 2, 4, 2).sum(axis=(1, 3))
    d11 = pix[(1, 1)].reshape(4, 2, 4, 2).sum(axis=(1, 3))
    assert (p00[:4, :4] == d00).all()
    assert (p00[4:, 4:] == d11).all()
    assert (p00[:4, 4:] == 0).all() and (p00[4:, :4] == 0).all()
    # sum preservation
    p11 = np.asarray(out["px"][1], np.int64)
    assert p11.sum() == pix[(2, 3)].sum()


def test_row_viewshed_matches_bruteforce():
    from hand_index_ray.pipelines.terrain import row_viewshed_batch

    rng = np.random.default_rng(2)
    h = rng.integers(0, 50, (200, 24))

    def brute(row):
        h0 = row[0]
        c = 0
        for x in range(1, len(row)):
            if all((row[x] - h0) * t > (row[t] - h0) * x
                   for t in range(1, x)):
                c += 1
        return c

    exp = np.array([brute(r) for r in h])
    assert (row_viewshed_batch(h) == exp).all()
    # monotone descending terrain: only x=1 visible
    assert row_viewshed_batch(np.arange(24)[::-1][None] * 10).tolist() \
        == [1]
