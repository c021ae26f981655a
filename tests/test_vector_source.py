"""Container-to-catalog e2e: GPKG / shapefile trees through
read_vector_catchments into build_catchments (the reference's real
input path: branch dirs of *gw_catchments*.gpkg, load.py:41,131-143)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from hand_index_ray.config import EngineConfig
from hand_index_ray.kernels import geom, wkb
from hand_index_ray.sources import gpkg
from hand_index_ray.sources import shapefile as shp
from hand_index_ray.sources.vector import read_vector_catchments


def _sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    float)


def _mesh_blobs(base):
    quads = [_sq(base, base, base + 500, base + 500),
             _sq(base + 500, base, base + 1000, base + 500),
             _sq(base, base + 500, base + 500, base + 1000),
             _sq(base + 500, base + 500, base + 1000, base + 1000)]
    return [wkb.encode(wkb.from_parts([[[q]]]))[0] for q in quads]


def _gpkg_tree(root, n_branches=2):
    for b in range(n_branches):
        bdir = root / f"branches/{b}"
        bdir.mkdir(parents=True)
        blobs = _mesh_blobs(1_000_000.0 + b * 10_000)
        gpkg.write_gpkg(str(bdir / f"gw_catchments_{b}.gpkg"),
                        "gw_catchments", list(range(1, 5)), blobs)
    return str(root / "branches" / "*" / "*gw_catchments*.gpkg")


def test_gpkg_tree_to_catalog(tmp_path, ray_session):
    from hand_index_ray.pipelines.build import build_catchments

    pattern = _gpkg_tree(tmp_path)
    raw = read_vector_catchments(pattern)
    out = build_catchments(raw, EngineConfig(simplify_tol_m=0.0)).to_pandas()
    assert len(out) == 2  # one dissolved row per branch dir
    for _, row in out.iterrows():
        g = wkb.decode([row["geometry"]])
        assert g.num_parts() == 1
        assert geom.area(g)[0] == pytest.approx(1000.0 * 1000.0)
        assert row["geom_count"] == 4
        assert "branches" in row["branch_path"]


def test_shp_tree_to_catalog(tmp_path, ray_session):
    from hand_index_ray.pipelines.build import build_catchments

    for b in range(2):
        bdir = tmp_path / f"branches/{b}"
        bdir.mkdir(parents=True)
        blobs = _mesh_blobs(2_000_000.0 + b * 10_000)
        rag = wkb.decode(blobs)
        geoms = []
        for gidx in range(len(rag)):
            gg = rag.geom_slice(gidx)
            rings = [gg.coords[gg.ring_coord_off[r]:gg.ring_coord_off[r + 1]]
                     for r in range(len(gg.ring_coord_off) - 1)]
            geoms.append([rings])
        shp.write_shapefile(str(bdir / "catch"), geoms)
    raw = read_vector_catchments(str(tmp_path / "branches/*/catch.shp"))
    out = build_catchments(raw, EngineConfig(simplify_tol_m=0.0)).to_pandas()
    assert len(out) == 2
    assert all(out["geom_count"] == 4)


def test_cli_build_catchments_gpkg(tmp_path):
    """CLI accepts a .gpkg glob directly (reference parity: the
    reference CLI takes the raw tree, load.py:327-341)."""
    pattern = _gpkg_tree(tmp_path)
    outdir = str(tmp_path / "catalog")
    env = dict(os.environ, PYTHONPATH="/root/repo", RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, "-m", "hand_index_ray", "build-catchments",
         "--input", pattern, "--output", outdir,
         "--simplify-tolerance", "0"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["output"] == outdir
    import pyarrow.parquet as pq
    got = pq.read_table(outdir).to_pandas()
    assert len(got) == 2 and set(got.columns) >= {"catchment_id",
                                                 "geometry", "h3_index"}
