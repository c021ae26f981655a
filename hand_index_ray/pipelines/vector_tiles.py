"""Vector-tile export pipeline: a catchment/footprint table →
one Mapbox Vector Tile blob per grid tile (kernels/mvt.py). The tile
grid is a fixed N×N split of the collection bbox (web-map pyramids
are the same construction per zoom); each feature lands in the tile
containing its bbox center and its coordinates quantize into the
tile-local integer extent. One file per tile → a failed export resumes
by skipping existing tiles (the S6 partitioned-sink contract).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..kernels import mvt as mvtlib
from ..kernels import wkb as wkblib
from ..relational import grouped_apply_bucketed


def _feature_frame(t: pa.Table, geom_col: str, id_col: str) -> pd.DataFrame:
    rag = wkblib.decode(t.column(geom_col).to_pylist())
    starts = rag.ring_coord_off[rag.part_ring_off[rag.geom_part_off[:-1]]]
    mx = np.maximum.reduceat(rag.coords, starts, axis=0)
    mn = np.minimum.reduceat(rag.coords, starts, axis=0)
    return pd.DataFrame({
        "fid": t.column(id_col).to_pandas(),
        "wkb": [bytes(b) for b in t.column(geom_col).to_pylist()],
        "cx": (mn[:, 0] + mx[:, 0]) / 2.0,
        "cy": (mn[:, 1] + mx[:, 1]) / 2.0,
    })


def export_mvt(ds: ray.data.Dataset, out_dir: str, *,
               geom_col: str = "geometry", id_col: str = "catchment_id",
               grid: int = 8, extent: int = 4096,
               bounds: "tuple[float, float, float, float] | None" = None,
               layer: str = "features") -> pd.DataFrame:
    """Export a geometry Dataset as ``{out_dir}/{tx}_{ty}.mvt`` files.
    Returns the manifest (tile_x, tile_y, n_features, path). ``bounds``
    defaults to the collection bbox (one cheap aggregate pass)."""
    os.makedirs(out_dir, exist_ok=True)
    if bounds is None:
        def bbox_part(t: pa.Table) -> pa.Table:
            rag = wkblib.decode(t.column(geom_col).to_pylist())
            if len(rag.coords) == 0:
                return pa.table({"minx": pa.array([], pa.float64()),
                                 "miny": pa.array([], pa.float64()),
                                 "maxx": pa.array([], pa.float64()),
                                 "maxy": pa.array([], pa.float64())})
            return pa.table({
                "minx": pa.array([float(rag.coords[:, 0].min())]),
                "miny": pa.array([float(rag.coords[:, 1].min())]),
                "maxx": pa.array([float(rag.coords[:, 0].max())]),
                "maxy": pa.array([float(rag.coords[:, 1].max())])})
        parts = ds.map_batches(bbox_part, batch_format="pyarrow").to_pandas()
        bounds = (parts.minx.min(), parts.miny.min(),
                  parts.maxx.max(), parts.maxy.max())
    x0, y0, x1, y1 = bounds
    sx = (x1 - x0) or 1.0
    sy = (y1 - y0) or 1.0

    def assign(t: pa.Table) -> pa.Table:
        df = _feature_frame(t, geom_col, id_col)
        tx = np.clip(((df.cx - x0) / sx * grid).astype(np.int64),
                     0, grid - 1)
        ty = np.clip(((df.cy - y0) / sy * grid).astype(np.int64),
                     0, grid - 1)
        df["tx"] = tx
        df["ty"] = ty
        return pa.Table.from_pandas(df, preserve_index=False)

    def write_tile(g: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(g.tx.iloc[0]), int(g.ty.iloc[0])
        ox = x0 + tx * sx / grid
        oy = y0 + ty * sy / grid
        qx = extent / (sx / grid)
        qy = extent / (sy / grid)
        feats = []
        rag = wkblib.decode(list(g.wkb))
        for i in range(len(rag)):
            gg = rag.geom_slice(i)
            parts = []
            for p in range(len(gg.part_ring_off) - 1):
                rings = []
                for ri in range(gg.part_ring_off[p],
                                gg.part_ring_off[p + 1]):
                    c0, c1 = gg.ring_coord_off[ri], gg.ring_coord_off[ri + 1]
                    pts = gg.coords[c0:c1]
                    q = np.column_stack([
                        np.round((pts[:, 0] - ox) * qx),
                        np.round((pts[:, 1] - oy) * qy)]).astype(np.int64)
                    rings.append(q)
                parts.append(rings)
            feats.append({"id": i, "type": mvtlib.POLYGON,
                          "geometry": parts,
                          "tags": {"fid": str(g.fid.iloc[i])}})
        blob = mvtlib.encode_tile([{"name": layer, "extent": extent,
                                    "features": feats}])
        path = os.path.join(out_dir, f"{tx}_{ty}.mvt")
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pd.DataFrame({"tile_x": [tx], "tile_y": [ty],
                             "n_features": [len(feats)],
                             "path": [path]})

    manifest = grouped_apply_bucketed(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["tx", "ty"], write_tile, num_buckets=min(64, grid * grid))
    return manifest.to_pandas().sort_values(["tile_x", "tile_y"]) \
        .reset_index(drop=True)
