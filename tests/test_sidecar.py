"""Build-time sidecar attach (J3): end-to-end from a synthetic HAND
file tree, mirroring reference load.py:206-253 semantics — branch-key
extraction, inner join onto Catchments(branch_path), DISTINCT for
hydrotables only, --calb pattern variant, pyarrow.fs passthrough."""

import os

import pyarrow as pa
import pytest


def _mk_tree(tmp_path):
    root = str(tmp_path / "hand")
    files = [
        "huc1200/branches/0/hydroTable_0.csv",
        "huc1200/branches/0/hydroTable_1.csv",
        "huc1200/branches/0/demDerived_rem_zeroed_masked.tif",
        "huc1200/branches/0/gw_catchments_reaches_filtered.tif",
        "huc1200/branches/1/hydroTable_0.csv",          # no catchment row
        "huc1200/usgs_elev_table.csv",                  # not a sidecar
        "huc1201/branches/2/hydroTable_0.csv",
        "huc1201/branches/2/demDerived_rem_zeroed.tif",
        "huc1200/branches/0/gw_catchments_pixels.gpkg",  # wrong extension
    ]
    for f in files:
        p = os.path.join(root, f)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as fh:
            fh.write("x")
    cat = pa.table({
        "catchment_id": pa.array(["cat-a", "cat-b"], pa.string()),
        "branch_path": pa.array([f"{root}/huc1200/branches/0/",
                                 f"{root}/huc1201/branches/2/"], pa.string()),
    })
    return root, cat


def test_attach_sidecars_tree(ray_session, tmp_path):
    from hand_index_ray.pipelines.sidecar import attach_sidecars

    root, cat = _mk_tree(tmp_path)
    out = attach_sidecars(root, cat)
    hydro = out["hydrotables"].to_pandas().sort_values(
        ["catchment_id", "csv_path"]).reset_index(drop=True)
    assert list(zip(hydro["catchment_id"], hydro["csv_path"])) == [
        ("cat-a", f"{root}/huc1200/branches/0/hydroTable_0.csv"),
        ("cat-a", f"{root}/huc1200/branches/0/hydroTable_1.csv"),
        ("cat-b", f"{root}/huc1201/branches/2/hydroTable_0.csv"),
    ]
    rem = out["rem_rasters"].to_pandas()
    assert set(zip(rem["catchment_id"], rem["raster_path"])) == {
        ("cat-a", f"{root}/huc1200/branches/0/demDerived_rem_zeroed_masked.tif"),
        ("cat-b", f"{root}/huc1201/branches/2/demDerived_rem_zeroed.tif"),
    }
    cr = out["catchment_rasters"].to_pandas()
    assert set(cr["raster_path"]) == {
        f"{root}/huc1200/branches/0/gw_catchments_reaches_filtered.tif"}


def test_attach_sidecars_distinct_on_duplicate_listing(ray_session, tmp_path):
    """Reference load.py:212 SELECT DISTINCT — a path listed twice must
    produce one hydrotable row (rasters keep plain join semantics)."""
    from hand_index_ray.pipelines.sidecar import attach_sidecars

    root, cat = _mk_tree(tmp_path)
    dup = f"{root}/huc1200/branches/0/hydroTable_0.csv"
    paths = [dup, dup, f"{root}/huc1200/branches/0/demDerived_rem_zeroed_masked.tif",
             f"{root}/huc1200/branches/0/demDerived_rem_zeroed_masked.tif"]
    out = attach_sidecars(paths, cat, root=root)
    hydro = out["hydrotables"].to_pandas()
    assert len(hydro) == 1 and hydro["csv_path"].iloc[0] == dup
    rem = out["rem_rasters"].to_pandas()
    assert len(rem) == 2  # no DISTINCT on rasters (reference parity)


def test_attach_sidecars_calb_variant(ray_session, tmp_path):
    """--calb: hydrotable CSVs live one level under the root and the
    extract pattern widens (reference load.py:42,208)."""
    from hand_index_ray.pipelines.sidecar import attach_sidecars

    root = str(tmp_path / "calb")
    p = os.path.join(root, "huc1200", "hydroTable_0.csv")
    os.makedirs(os.path.dirname(p), exist_ok=True)
    open(p, "w").write("x")
    deep = os.path.join(root, "huc1200", "branches", "0", "hydroTable_0.csv")
    os.makedirs(os.path.dirname(deep), exist_ok=True)
    open(deep, "w").write("x")
    cat = pa.table({
        "catchment_id": pa.array(["cat-c"], pa.string()),
        "branch_path": pa.array([f"{root}/huc1200/"], pa.string()),
    })
    out = attach_sidecars(root, cat, calb=True)
    hydro = out["hydrotables"].to_pandas()
    # only the root-level CSV matches in calb mode
    assert list(hydro["csv_path"]) == [p]
    out2 = attach_sidecars(root, cat, calb=False)
    assert len(out2["hydrotables"].to_pandas()) == 0  # key huc-level ≠ branch-level


def test_list_files_with_fs_handle(tmp_path):
    """ST4 filesystem passthrough: an explicit pyarrow.fs handle."""
    from pyarrow import fs as pafs

    from hand_index_ray.pipelines.sidecar import list_files

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "a"))
    open(os.path.join(root, "a", "f.csv"), "w").write("x")
    got = list_files(root, filesystem=pafs.LocalFileSystem())
    assert got == [os.path.join(root, "a", "f.csv")]


def test_attach_sidecars_writes_parquet(ray_session, tmp_path):
    from hand_index_ray.pipelines.sidecar import attach_sidecars

    root, cat = _mk_tree(tmp_path)
    out_dir = str(tmp_path / "sidecars")
    out = attach_sidecars(root, cat, out_dir=out_dir)
    assert sorted(os.listdir(out_dir)) == [
        "catchment_rasters.parquet", "hydrotables.parquet", "rem_rasters.parquet"]
    # written tables are readable and row-identical to the returned sets
    assert out["hydrotables"].count() == 3


def test_attach_attributes_consumes_built_sidecars(ray_session, tmp_path):
    """End of the J3 loop: the query-side 3-way attribute join consumes
    the sidecar tables this pipeline built."""
    from hand_index_ray.pipelines.query import attach_attributes
    from hand_index_ray.pipelines.sidecar import attach_sidecars

    root, cat = _mk_tree(tmp_path)
    out_dir = str(tmp_path / "vec")
    attach_sidecars(root, cat, out_dir=out_dir)
    attrs = attach_attributes(["cat-a", "cat-b"], out_dir)
    df = attrs.to_pandas()
    a = df[df["catchment_id"] == "cat-a"]
    assert set(a["csv_path"]) == {f"{root}/huc1200/branches/0/hydroTable_0.csv",
                                  f"{root}/huc1200/branches/0/hydroTable_1.csv"}
    assert a["rem_raster_path"].notna().all()


def test_attach_sidecars_uri_root(ray_session, tmp_path):
    """A URI-addressed root ('file://...') must anchor the match patterns
    at the scheme-STRIPPED path that pyarrow.fs actually lists — a
    scheme-prefixed anchor silently matches nothing."""
    from hand_index_ray.pipelines.sidecar import attach_sidecars

    root, cat = _mk_tree(tmp_path)
    out = attach_sidecars(f"file://{root}", cat)
    hydro = out["hydrotables"].to_pandas()
    assert len(hydro) == 3
    assert all(p.startswith(root) for p in hydro["csv_path"])
