"""Point-cloud pipelines: LAS → gridded DEM GeoTIFF (the production
form of q157's gridding). The shuffle is the grouped partial-sum per
cell; the driver only ever holds the GRID (bounded by --size), never
the points — at 100 TB the points stream through the partial
aggregation and the output raster is tiles of a fixed mosaic.
"""

from __future__ import annotations

import os

import numpy as np

from ..kernels.geotiff import encode_geotiff
from ..relational import grouped_agg
from ..sources.las import read_las


def grid_las(paths, out_path: str, *, cell_size: int = 500,
             width: int = 0, height: int = 0, nodata: int = -1,
             origin: "tuple[int, int]" = (0, 0),
             shard_points: int = 2_000_000) -> dict:
    """Grid LAS point elevations to floor-mean cells and write one
    GeoTIFF. Returns stats (cells, filled, points)."""
    import pyarrow as pa

    ox, oy = origin
    ds = read_las(paths, shard_points=shard_points)

    def cells(t: pa.Table) -> pa.Table:
        xi = t.column("xi").to_numpy()
        yi = t.column("yi").to_numpy()
        zi = t.column("zi").to_numpy()
        return pa.table({
            "cx": pa.array((xi - ox) // cell_size, pa.int64()),
            "cy": pa.array((yi - oy) // cell_size, pa.int64()),
            "zi": pa.array(zi.astype(np.int64), pa.int64())})

    g = grouped_agg(ds.map_batches(cells, batch_format="pyarrow"),
                    ["cx", "cy"], sum_cols=["zi"]).to_pandas()
    g = g[(g.cx >= 0) & (g.cy >= 0)]
    W = int(width or (g.cx.max() + 1 if len(g) else 1))
    H = int(height or (g.cy.max() + 1 if len(g) else 1))
    g = g[(g.cx < W) & (g.cy < H)]
    dem = np.full((H, W), nodata, np.int32)
    dem[g.cy.to_numpy(np.int64), g.cx.to_numpy(np.int64)] = (
        g.zi.to_numpy(np.int64) // g.n.to_numpy(np.int64)).astype(np.int32)
    blob = encode_geotiff(dem, compression="deflate", predictor=2)
    tmp = out_path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, out_path)
    return {"width": W, "height": H, "filled_cells": int(len(g)),
            "points": int(g.n.sum()) if len(g) else 0,
            "output": out_path}
