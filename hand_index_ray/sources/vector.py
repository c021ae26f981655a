"""Vector-source dispatch for the catchment build: GeoPackage trees
(the reference's real input — ``*gw_catchments*.gpkg`` per branch dir,
load.py:41,131-143), ESRI shapefile trios, or parquet with a prepared
``(geometry, branch_path)`` schema. All normalize to the exact input
contract of ``pipelines/build.build_catchments``:

    geometry     WKB binary (nulls already dropped — load.py:143
                 ``WHERE geom IS NOT NULL``)
    branch_path  the per-file branch directory (load.py:143 attaches
                 it as a constant per source file)
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data


def read_vector_catchments(path, *, filesystem=None) -> ray.data.Dataset:
    """Dispatch by extension; returns a Dataset of
    ``(geometry, branch_path)``. ``path`` may be a glob."""
    p = str(path)
    low = p.lower()
    if low.endswith(".gpkg") or "*gpkg" in low or ".gpkg" in low:
        from .gpkg import read_gpkg
        ds = read_gpkg(p, filesystem=filesystem)
        return ds.map_batches(_normalize_gpkg, batch_format="pyarrow")
    if low.endswith((".shp", ".shx", ".dbf")) or ".shp" in low:
        from .shapefile import read_shapefile
        ds = read_shapefile(p)
        return ds.map_batches(_normalize_gpkg, batch_format="pyarrow")
    return ray.data.read_parquet(p, filesystem=filesystem) \
        .map_batches(_normalize_parquet, batch_format="pyarrow")


def _normalize_gpkg(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or "wkb" not in t.column_names:
        return pa.table({"geometry": pa.array([], pa.binary()),
                         "branch_path": pa.array([], pa.string())})
    branch = [os.path.dirname(v) for v in t.column("src_path").to_pylist()]
    return pa.table({"geometry": t.column("wkb").cast(pa.binary()),
                     "branch_path": pa.array(branch, pa.string())})


def _normalize_parquet(t: pa.Table) -> pa.Table:
    return t.select(["geometry", "branch_path"])
