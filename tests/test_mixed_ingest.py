"""Mixed-format ingestion end-to-end (VERDICT r3 item 7): one catchment
suite built from a tree mixing GPKG + Shapefile + GeoJSON-seq sources,
normalized to (geometry, branch_path), dissolved per branch, wired
through attach-sidecars, and queried by ROI — counts must match the
per-source sums."""

import os
import re

import numpy as np
import pyarrow as pa
import pytest

from hand_index_ray.kernels import proj, wkb


def _sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s],
                     [x0, y0 + s], [x0, y0]], float)


N_GPKG, N_SHP, N_NDJ = 4, 3, 2


def _mk_tree(tmp_path):
    """Albers-coordinate squares: branch 0 (GPKG, 4 features) around
    x=0, branch 1 (SHP, 3) around x=400k, branch 2 (NDJSON, 2) around
    x=800k; every branch dir also carries a hydroTable CSV."""
    from hand_index_ray.sources import geojsonseq as gjs
    from hand_index_ray.sources import gpkg as gp
    from hand_index_ray.sources import shapefile as shp

    root = str(tmp_path / "hand")
    branches = [os.path.join(root, "huc10", "branches", str(b))
                for b in range(3)]
    for b in branches:
        os.makedirs(b, exist_ok=True)
        with open(os.path.join(b, "hydroTable_0.csv"), "w") as fh:
            fh.write("x\n")

    def squares(x_base, n):
        # adjacent squares sharing edges — dissolve-friendly tessellation
        return [_sq(x_base + i * 10_000.0, 1_500_000.0, 10_000.0)
                for i in range(n)]

    sq0 = squares(0.0, N_GPKG)
    rag0 = wkb.from_parts([[[s]] for s in sq0])
    gp.write_gpkg(os.path.join(branches[0], "gw_catchments.gpkg"),
                  "catch", list(range(1, N_GPKG + 1)), wkb.encode(rag0),
                  props={"ht": [i * 1.0 for i in range(N_GPKG)]})

    sq1 = squares(400_000.0, N_SHP)
    shp.write_shapefile(os.path.join(branches[1], "catch"),
                        [[[s]] for s in sq1],
                        fields={"HT": [i for i in range(N_SHP)]})

    sq2 = squares(800_000.0, N_NDJ)
    rag2 = wkb.from_parts([[[s]] for s in sq2])
    gjs.write_geojsonseq(os.path.join(branches[2], "catch.ndjson"), rag2,
                         [{"id": i} for i in range(N_NDJ)])
    return root, branches


def _normalize(ds, branch_of_path=None, branch_const=None):
    """Any source schema → (geometry, branch_path)."""
    def f(t: pa.Table) -> pa.Table:
        if branch_const is not None:
            bp = [branch_const] * t.num_rows
        else:
            bp = [branch_of_path(p) for p in
                  t.column("src_path").to_pylist()]
        return pa.table({"geometry": t.column("wkb").cast(pa.binary()),
                         "branch_path": pa.array(bp, pa.string())})
    return ds.map_batches(f, batch_format="pyarrow")


def test_mixed_format_catchment_suite_e2e(ray_session, tmp_path):
    import ray.data

    from hand_index_ray.config import EngineConfig
    from hand_index_ray.pipelines.build import build_catchments
    from hand_index_ray.pipelines.query import roi_query_catchments
    from hand_index_ray.pipelines.sidecar import attach_sidecars
    from hand_index_ray.sources.geojsonseq import read_geojsonseq
    from hand_index_ray.sources.gpkg import read_gpkg
    from hand_index_ray.sources.shapefile import read_shapefile

    root, branches = _mk_tree(tmp_path)
    branch_of = lambda p: re.match(r"(.*/branches/[^/]+/)", p).group(1)

    parts = [
        _normalize(read_gpkg(os.path.join(branches[0], "gw_catchments.gpkg")),
                   branch_of),
        _normalize(read_shapefile(os.path.join(branches[1], "catch.shp")),
                   branch_of),
        _normalize(read_geojsonseq(os.path.join(branches[2], "catch.ndjson")),
                   branch_const=branches[2] + "/"),
    ]
    raw = parts[0].union(parts[1]).union(parts[2])
    cfg = EngineConfig(simplify_tol_m=0.0)
    cat = build_catchments(raw, cfg).to_pandas().sort_values("branch_path")

    # per-source sums survive the union + dissolve
    assert len(cat) == 3
    assert list(cat["geom_count"]) == [N_GPKG, N_SHP, N_NDJ]
    total = N_GPKG + N_SHP + N_NDJ
    assert int(cat["geom_count"].sum()) == total
    # dissolve area = per-branch tessellation area (shared edges cancel)
    from hand_index_ray.kernels import geom as geomk
    rag = wkb.decode(list(cat["geometry"]))
    areas = geomk.area(rag)
    for i, n in enumerate([N_GPKG, N_SHP, N_NDJ]):
        assert areas[i] == pytest.approx(n * 10_000.0 ** 2, rel=1e-9)

    # attach-sidecars over the same tree joins every branch's CSV
    cat_tbl = pa.table({
        "catchment_id": pa.array(list(cat["catchment_id"]), pa.string()),
        "branch_path": pa.array(list(cat["branch_path"]), pa.string())})
    out = attach_sidecars(root, cat_tbl)
    hydro = out["hydrotables"].to_pandas()
    assert len(hydro) == 3
    assert set(hydro["catchment_id"]) == set(cat["catchment_id"])

    # ROI query: a ring covering ONLY branch 0's squares keeps exactly
    # that branch's dissolved catchment
    import pyarrow.parquet as pq

    catalog = str(tmp_path / "catalog.parquet")
    pq.write_table(pa.Table.from_pandas(cat, preserve_index=False), catalog)
    gx = np.array([-20_000.0, 60_000.0, 60_000.0, -20_000.0, -20_000.0])
    gy = np.array([1_480_000.0, 1_480_000.0, 1_520_000.0, 1_520_000.0,
                   1_480_000.0])
    lon, lat = proj.albers_to_lonlat(gx, gy)
    kept = roi_query_catchments(catalog, np.stack([lon, lat], axis=1),
                                threshold_pct=10.0).to_pandas()
    assert list(kept["catchment_id"]) == [
        cat.iloc[0]["catchment_id"]]
