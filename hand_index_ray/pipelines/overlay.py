"""Vector↔vector polygon layer overlay (pairwise intersection areas).

The classic GIS overlay operator (union/intersect of two polygon
LAYERS — e.g. catchments × land-cover parcels): every pair of
polygons, one from each layer, that genuinely intersects is emitted
once with its exact intersection area. The reference reaches this
shape through DuckDB spatial joins (query_geojson.py:188-192
``g.intersection(query).area``); here it is a single cell-key shuffle:

- both layers explode to covering cells of ONE fixed integer lattice
  (cell edge = ``cell``), carrying only (cell, side, id, wkb, bbox)
  slim rows;
- each cell co-group runs a vectorized bbox prefilter, then the exact
  general polygon clip (kernels/geom.py:clip_area_general — handles
  concave + holed) per surviving candidate;
- a pair overlapping many cells is emitted ONLY by its canonical
  cell — the cell containing the bbox-intersection's lower-left
  corner, which both coverings provably contain (same exactly-once
  contract as pipelines/query.py:zonal_join).

Scale shape: the shuffle payload is O(polygons × cells covered); no
layer is ever broadcast or materialized whole; skewed dense cells can
reuse zonal_join's salting (document: pass a finer ``cell``).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..kernels import geom as geomlib
from ..kernels import wkb as kwkb

_OFF = 1 << 30  # lattice-cell offset so negative cells pack monotonically


def _explode(side: int, id_col: str, wkb_col: str, cell: float):
    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "side": pa.array([], pa.int8()),
                          "id": pa.array([], pa.int64()),
                          "wkb": pa.array([], pa.binary()),
                          "minx": pa.array([], pa.float64()),
                          "miny": pa.array([], pa.float64()),
                          "maxx": pa.array([], pa.float64()),
                          "maxy": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        wkbs = t.column(wkb_col).to_pylist()
        rag = kwkb.decode(wkbs)
        bb = geomlib.bounds(rag)  # (N, 4) minx miny maxx maxy
        cx0 = np.floor(bb[:, 0] / cell).astype(np.int64)
        cy0 = np.floor(bb[:, 1] / cell).astype(np.int64)
        cx1 = np.floor(bb[:, 2] / cell).astype(np.int64)
        cy1 = np.floor(bb[:, 3] / cell).astype(np.int64)
        nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
        n = nx * ny
        g = np.repeat(np.arange(len(n)), n)
        step = np.arange(int(n.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(n) - n, n)
        cx = cx0[g] + step % nx[g]
        cy = cy0[g] + step // nx[g]
        ids = t.column(id_col).to_numpy(zero_copy_only=False)[g]
        wkb_rep = [wkbs[i] for i in g]
        # offset keeps the packed key correct for negative cells
        return pa.table({
            "cell": pa.array((cx + _OFF) * (1 << 32) + (cy + _OFF),
                             pa.int64()),
            "side": pa.array(np.full(len(g), side, np.int8()), pa.int8()),
            "id": pa.array(ids.astype(np.int64), pa.int64()),
            "wkb": pa.array(wkb_rep, pa.binary()),
            "minx": pa.array(bb[g, 0], pa.float64()),
            "miny": pa.array(bb[g, 1], pa.float64()),
            "maxx": pa.array(bb[g, 2], pa.float64()),
            "maxy": pa.array(bb[g, 3], pa.float64())})
    return fn


def overlay_intersection_areas(layer_a: ray.data.Dataset,
                               layer_b: ray.data.Dataset,
                               cell: float,
                               id_col: str = "id",
                               wkb_col: str = "wkb",
                               num_buckets: int = 64
                               ) -> ray.data.Dataset:
    """Exact pairwise intersection areas between two polygon layers.

    Returns Dataset[(a_id, b_id, area)] with one row per genuinely
    intersecting pair (area > 0), each emitted exactly once."""
    from ..relational import grouped_apply_bucketed

    ea = layer_a.map_batches(_explode(0, id_col, wkb_col, cell),
                             batch_format="pyarrow")
    eb = layer_b.map_batches(_explode(1, id_col, wkb_col, cell),
                             batch_format="pyarrow")
    both = ea.union(eb)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a_id": pd.Series([], dtype="int64"),
                              "b_id": pd.Series([], dtype="int64"),
                              "area": pd.Series([], dtype="float64")})
        if len(g) == 0:
            return empty
        key = int(g["cell"].iloc[0])
        cellx = (key >> 32) - _OFF
        celly = (key & 0xFFFFFFFF) - _OFF
        a = g[g["side"] == 0]
        b = g[g["side"] == 1]
        if len(a) == 0 or len(b) == 0:
            return empty
        ax0 = a["minx"].to_numpy(); ay0 = a["miny"].to_numpy()
        ax1 = a["maxx"].to_numpy(); ay1 = a["maxy"].to_numpy()
        bx0 = b["minx"].to_numpy(); by0 = b["miny"].to_numpy()
        bx1 = b["maxx"].to_numpy(); by1 = b["maxy"].to_numpy()
        # vectorized bbox prefilter (strict overlap)
        ox = np.maximum(ax0[:, None], bx0[None, :])
        oy = np.maximum(ay0[:, None], by0[None, :])
        hit = ((np.minimum(ax1[:, None], bx1[None, :]) > ox)
               & (np.minimum(ay1[:, None], by1[None, :]) > oy))
        # exactly-once: this cell must contain the bbox-intersection's
        # lower-left corner
        canon = ((np.floor(ox / cell).astype(np.int64) == cellx)
                 & (np.floor(oy / cell).astype(np.int64) == celly))
        ii, jj = np.nonzero(hit & canon)
        if len(ii) == 0:
            return empty
        ra = kwkb.decode(a["wkb"].tolist())
        rb = kwkb.decode(b["wkb"].tolist())
        rows = []
        aid = a["id"].to_numpy(); bid = b["id"].to_numpy()
        for i, j in zip(ii, jj):
            ar = geomlib.clip_area_general(ra, int(i), rb, int(j))
            if ar > 0.0:
                rows.append((int(aid[i]), int(bid[j]), ar))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["a_id", "b_id", "area"])

    return grouped_apply_bucketed(both, ["cell"], per_cell,
                                  num_buckets=num_buckets)


def _seg_explode(side: int, cs: int):
    """Explode integer segments to covering lattice cells (cell edge =
    ``cs``), slim (cell, side, id, x1, y1, x2, y2) rows."""
    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy().astype(np.int64)
        x1 = t.column("x1").to_numpy().astype(np.int64)
        y1 = t.column("y1").to_numpy().astype(np.int64)
        x2 = t.column("x2").to_numpy().astype(np.int64)
        y2 = t.column("y2").to_numpy().astype(np.int64)
        cx0 = np.minimum(x1, x2) // cs
        cx1 = np.maximum(x1, x2) // cs
        cy0 = np.minimum(y1, y2) // cs
        cy1 = np.maximum(y1, y2) // cs
        nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
        n = nx * ny
        g = np.repeat(np.arange(len(n)), n)
        step = np.arange(int(n.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(n) - n, n)
        cx = cx0[g] + step % nx[g]
        cy = cy0[g] + step // nx[g]
        return pa.table({
            "cell": pa.array((cx + _OFF) * (1 << 32) + (cy + _OFF),
                             pa.int64()),
            "side": pa.array(np.full(len(g), side, np.int8()), pa.int8()),
            "id": pa.array(ids[g], pa.int64()),
            "x1": pa.array(x1[g], pa.int64()),
            "y1": pa.array(y1[g], pa.int64()),
            "x2": pa.array(x2[g], pa.int64()),
            "y2": pa.array(y2[g], pa.int64())})
    return fn


def segment_crossings(layer_a: ray.data.Dataset,
                      layer_b: ray.data.Dataset, cs: int,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Distributed line-layer crossing join (the candidate-pair pass of
    GIS node-ing / planar overlay of line layers): every (a, b) pair of
    integer segments, one per layer, that PROPERLY cross — orientation
    signs strictly opposite on both sides, touching/collinear excluded
    — emitted exactly once as (a_id, b_id).

    Same shuffle shape as ``overlay_intersection_areas``: segments
    explode to bbox-covering cells of one integer lattice, each cell
    co-group runs a fully vectorized sign test (no per-pair Python),
    and a pair sharing many cells is emitted only by the canonical
    cell containing the bbox-intersection's lower-left corner (which
    both coverings provably contain). All arithmetic is exact int64 —
    coordinates must satisfy |coord| < 2^20 so the orientation
    products stay in range."""
    from ..relational import grouped_apply_bucketed

    ea = layer_a.map_batches(_seg_explode(0, cs), batch_format="pyarrow")
    eb = layer_b.map_batches(_seg_explode(1, cs), batch_format="pyarrow")
    both = ea.union(eb)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a_id": pd.Series([], dtype="int64"),
                              "b_id": pd.Series([], dtype="int64")})
        a = g[g["side"] == 0]
        b = g[g["side"] == 1]
        if len(a) == 0 or len(b) == 0:
            return empty
        key = int(g["cell"].iloc[0])
        cellx = (key >> 32) - _OFF
        celly = (key & 0xFFFFFFFF) - _OFF
        ax1 = a["x1"].to_numpy()[:, None]; ay1 = a["y1"].to_numpy()[:, None]
        ax2 = a["x2"].to_numpy()[:, None]; ay2 = a["y2"].to_numpy()[:, None]
        bx1 = b["x1"].to_numpy()[None, :]; by1 = b["y1"].to_numpy()[None, :]
        bx2 = b["x2"].to_numpy()[None, :]; by2 = b["y2"].to_numpy()[None, :]
        # canonical cell: lower-left corner of the bbox intersection
        ox = np.maximum(np.minimum(ax1, ax2), np.minimum(bx1, bx2))
        oy = np.maximum(np.minimum(ay1, ay2), np.minimum(by1, by2))
        canon = (ox // cs == cellx) & (oy // cs == celly)
        dax = ax2 - ax1; day = ay2 - ay1
        dbx = bx2 - bx1; dby = by2 - by1
        d1 = dax * (by1 - ay1) - day * (bx1 - ax1)
        d2 = dax * (by2 - ay1) - day * (bx2 - ax1)
        d3 = dbx * (ay1 - by1) - dby * (ax1 - bx1)
        d4 = dbx * (ay2 - by1) - dby * (ax2 - bx1)
        hit = canon & (d1 * d2 < 0) & (d3 * d4 < 0)
        ii, jj = np.nonzero(hit)
        if len(ii) == 0:
            return empty
        return pd.DataFrame({"a_id": a["id"].to_numpy()[ii],
                             "b_id": b["id"].to_numpy()[jj]})

    return grouped_apply_bucketed(both, ["cell"], per_cell,
                                  num_buckets=num_buckets)


def crossing_points(layer_a: ray.data.Dataset,
                    layer_b: ray.data.Dataset, cs: int,
                    num_buckets: int = 64) -> ray.data.Dataset:
    """``segment_crossings`` upgraded to emit the intersection POINT of
    every properly-crossing pair as EXACT RATIONALS — the node-ing
    step of planar overlay, where float coordinates would break
    downstream snapping. For segments A=(a1,a2), B=(b1,b2) the point is
    a1 + t·(a2−a1) with t = d1/(d1−d2) (orientation cross-products), so

        x = (x1·den + t_num·dax) / den,  den = d1 − d2

    emitted as (x_num, y_num, den) with den > 0 canonical sign. Same
    exactly-once rule as segment_crossings (canonical cell of the
    bbox-intersection corner); same one cell-keyed shuffle;
    |coord| < 2^20 keeps every product in int64."""
    from ..relational import grouped_apply_bucketed

    ea = layer_a.map_batches(_seg_explode(0, cs), batch_format="pyarrow")
    eb = layer_b.map_batches(_seg_explode(1, cs), batch_format="pyarrow")
    both = ea.union(eb)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "a_id": pd.Series([], dtype="int64"),
            "b_id": pd.Series([], dtype="int64"),
            "x_num": pd.Series([], dtype="int64"),
            "y_num": pd.Series([], dtype="int64"),
            "den": pd.Series([], dtype="int64")})
        a = g[g["side"] == 0]
        b = g[g["side"] == 1]
        if len(a) == 0 or len(b) == 0:
            return empty
        key = int(g["cell"].iloc[0])
        cellx = (key >> 32) - _OFF
        celly = (key & 0xFFFFFFFF) - _OFF
        ax1 = a["x1"].to_numpy()[:, None]; ay1 = a["y1"].to_numpy()[:, None]
        ax2 = a["x2"].to_numpy()[:, None]; ay2 = a["y2"].to_numpy()[:, None]
        bx1 = b["x1"].to_numpy()[None, :]; by1 = b["y1"].to_numpy()[None, :]
        bx2 = b["x2"].to_numpy()[None, :]; by2 = b["y2"].to_numpy()[None, :]
        ox = np.maximum(np.minimum(ax1, ax2), np.minimum(bx1, bx2))
        oy = np.maximum(np.minimum(ay1, ay2), np.minimum(by1, by2))
        canon = (ox // cs == cellx) & (oy // cs == celly)
        dax = ax2 - ax1; day = ay2 - ay1
        dbx = bx2 - bx1; dby = by2 - by1
        d1 = dax * (by1 - ay1) - day * (bx1 - ax1)
        d2 = dax * (by2 - ay1) - day * (bx2 - ax1)
        d3 = dbx * (ay1 - by1) - dby * (ax1 - bx1)
        d4 = dbx * (ay2 - by1) - dby * (ax2 - bx1)
        hit = canon & (d1 * d2 < 0) & (d3 * d4 < 0)
        ii, jj = np.nonzero(hit)
        if len(ii) == 0:
            return empty
        # point = b1 + u·(b2−b1), u = d1/(d1−d2) along B (d1,d2 are
        # B-endpoint orientations vs A) — exact rationals over den
        den = (d1 - d2)[hit]
        u_num = d1[hit]
        bx1h = np.broadcast_to(bx1, hit.shape)[hit]
        by1h = np.broadcast_to(by1, hit.shape)[hit]
        dbxh = np.broadcast_to(dbx, hit.shape)[hit]
        dbyh = np.broadcast_to(dby, hit.shape)[hit]
        x_num = bx1h * den + u_num * dbxh
        y_num = by1h * den + u_num * dbyh
        neg = den < 0
        den = np.where(neg, -den, den)
        x_num = np.where(neg, -x_num, x_num)
        y_num = np.where(neg, -y_num, y_num)
        return pd.DataFrame({"a_id": a["id"].to_numpy()[ii],
                             "b_id": b["id"].to_numpy()[jj],
                             "x_num": x_num, "y_num": y_num,
                             "den": den})

    return grouped_apply_bucketed(both, ["cell"], per_cell,
                                  num_buckets=num_buckets)
