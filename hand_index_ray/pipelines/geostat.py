"""Geostatistics over distributed integer point sets.

``semivariogram`` is the experimental (Matheron) semivariogram — the
fitting input for kriging, the interpolation family the reference's
HAND/terrain products come from upstream. The pair enumeration is the
same one-shuffle eps-grid shape as DBSCAN (``pipelines/cluster.py``):

1. every site shuffles ONCE on its ``max_lag``-sized grid cell and is
   replicated to the 8 neighbor cells as a ghost, so every pair with
   d ≤ max_lag co-lives in the smaller id's home cell's 3×3 block;
2. each cell group emits exactly-once per-bin PARTIALS
   (pair count, Σ(v_i − v_j)²) — never the pairs themselves;
3. a tiny bin-keyed grouped sum merges the partials.

Scale shape: shuffle payload is slim (cell, home, id, x, y, v) ×9;
per-cell work is bounded by local density × the 3×3 block; the merge
moves ``nbins`` rows per cell group. γ(bin) = num / (2·n) divides only
at the reader — everything shuffled is exact int64.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_OFF = 1 << 30


def _explode9v(cell: int):
    """9 rows per site: (cell, home, id, x, y, v) — the DBSCAN ghost
    explode with an int64 value column riding along."""
    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "home": pa.array([], pa.int8()),
                             "id": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        ids = t.column("id").to_numpy().astype(np.int64)
        v = t.column("v").to_numpy().astype(np.int64)
        cx = x // cell
        cy = y // cell
        dx = np.array([-1, 0, 1] * 3, np.int64)
        dy = np.repeat(np.array([-1, 0, 1], np.int64), 3)
        CX = (cx[:, None] + dx[None, :]).ravel()
        CY = (cy[:, None] + dy[None, :]).ravel()
        home = np.tile((dx == 0) & (dy == 0), n).astype(np.int8)
        rep = np.repeat(np.arange(n), 9)
        return pa.table({
            "cell": pa.array((CX + _OFF) * (1 << 32) + (CY + _OFF),
                             pa.int64()),
            "home": pa.array(home, pa.int8()),
            "id": pa.array(ids[rep], pa.int64()),
            "x": pa.array(x[rep], pa.int64()),
            "y": pa.array(y[rep], pa.int64()),
            "v": pa.array(v[rep], pa.int64())})
    return fn


def semivariogram(points: ray.data.Dataset, max_lag: int,
                  nbins: int = 8,
                  num_buckets: int = 64) -> ray.data.Dataset:
    """Experimental semivariogram over Dataset[(id, x, y, v)] (int64):
    for every unordered site pair with 1 ≤ d² ≤ max_lag², bin =
    ((d² − 1) · nbins) // max_lag² and per bin report exact
    n_pairs and gamma_num = Σ (v_i − v_j)²; the estimator is
    γ(bin) = gamma_num / (2 · n_pairs). Returns
    Dataset[(d2_bin, n_pairs, gamma_num)]."""
    from ..relational import grouped_agg, grouped_apply_bucketed

    max2 = int(max_lag) * int(max_lag)

    def bin_partials(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "d2_bin": pd.Series([], dtype="int64"),
            "n_pairs": pd.Series([], dtype="int64"),
            "gamma_num": pd.Series([], dtype="int64")})
        if len(g) == 0:
            return empty
        h = g[g["home"] == 1]
        if len(h) == 0:
            return empty
        hx = h["x"].to_numpy(); hy = h["y"].to_numpy()
        hid = h["id"].to_numpy(); hv = h["v"].to_numpy()
        ax = g["x"].to_numpy(); ay = g["y"].to_numpy()
        aid = g["id"].to_numpy(); av = g["v"].to_numpy()
        d2 = (hx[:, None] - ax[None, :]) ** 2 \
            + (hy[:, None] - ay[None, :]) ** 2
        # exactly-once: the smaller id's HOME cell owns the pair
        take = (d2 >= 1) & (d2 <= max2) & (hid[:, None] < aid[None, :])
        ii, jj = np.nonzero(take)
        if len(ii) == 0:
            return empty
        b = (d2[ii, jj] - 1) * nbins // max2
        dv2 = (hv[ii] - av[jj]) ** 2
        cnt = np.bincount(b, minlength=nbins)
        # weighted bincount routes through float64 (exact only below
        # 2^53) — scatter-add in int64 instead
        num = np.zeros(nbins, np.int64)
        np.add.at(num, b, dv2)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"d2_bin": nz.astype(np.int64),
                             "n_pairs": cnt[nz].astype(np.int64),
                             "gamma_num": num[nz]})

    parts = grouped_apply_bucketed(
        points.map_batches(_explode9v(max_lag), batch_format="pyarrow"),
        ["cell"], bin_partials, num_buckets=num_buckets)
    agg = grouped_agg(parts, ["d2_bin"],
                      sum_cols=["n_pairs", "gamma_num"], count=False)
    return agg.select_columns(["d2_bin", "n_pairs", "gamma_num"])


def kernel_heatmap(ds: "ray.data.Dataset", x: str, y: str, r: int,
                   cs: int, nx: int, ny: int) -> "ray.data.Dataset":
    """Triangle-kernel (separable tent) heatmap rasterization: each
    integer point adds w = max(0, r − |i·cs − px|) · max(0, r −
    |j·cs − py|) to every grid cell center (i·cs, j·cs) — the exact-
    integer form of the classic KDE heat map. SHUFFLE-FREE: each batch
    scatter-adds its points into a dense (nx, ny) int64 grid (a point
    touches ≤ ⌈2r/cs⌉² cells, vectorized outer-product add per offset
    pair) and emits the grid as nx·ny partial rows; a tiny grouped sum
    merges the partials. Returns (cx, cy, heat) for every cell."""
    import pyarrow as pa

    from ..relational import grouped_agg

    span = (r - 1) // cs + 1  # max |i − px//cs| with nonzero weight

    def partial(t: pa.Table) -> pa.Table:
        px = t.column(x).to_numpy().astype(np.int64)
        py = t.column(y).to_numpy().astype(np.int64)
        grid = np.zeros((nx, ny), np.int64)
        bx = px // cs
        by = py // cs
        for di in range(-span, span + 1):
            i = bx + di
            wx = r - np.abs(i * cs - px)
            for dj in range(-span, span + 1):
                j = by + dj
                wy = r - np.abs(j * cs - py)
                w = np.maximum(wx, 0) * np.maximum(wy, 0)
                m = (i >= 0) & (i < nx) & (j >= 0) & (j < ny) & (w > 0)
                np.add.at(grid, (i[m], j[m]), w[m])
        ii, jj = np.meshgrid(np.arange(nx, dtype=np.int64),
                             np.arange(ny, dtype=np.int64), indexing="ij")
        return pa.table({"cx": pa.array(ii.ravel(), pa.int64()),
                         "cy": pa.array(jj.ravel(), pa.int64()),
                         "heat": pa.array(grid.ravel(), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(parts, ["cx", "cy"], sum_cols=["heat"],
                       count=False)


def rect_union_area(ds: ray.data.Dataset, key: str, x1: str, y1: str,
                    x2: str, y2: str,
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Union area of axis-aligned integer rectangles per key — the
    tile-coverage measure (how much ground do a group's footprints
    actually cover, overlaps counted once). ONE keyed shuffle; per key
    the classic coordinate-compression decomposition, fully
    vectorized: all four corners of every rectangle hit a 2-D
    difference array in one ``np.add.at`` scatter, two cumsums
    recover per-cell coverage counts, and the union area is the
    cell-area dot (count > 0) — no per-rectangle Python.
    Returns (key, area, n_rects)."""
    def per(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, gg in g.groupby(key, sort=False):
            ax1 = gg[x1].to_numpy(np.int64)
            ay1 = gg[y1].to_numpy(np.int64)
            ax2 = gg[x2].to_numpy(np.int64)
            ay2 = gg[y2].to_numpy(np.int64)
            ok = (ax2 > ax1) & (ay2 > ay1)
            ax1, ay1, ax2, ay2 = ax1[ok], ay1[ok], ax2[ok], ay2[ok]
            if len(ax1) == 0:
                rows.append((k, 0, int(len(gg))))
                continue
            xs = np.unique(np.concatenate([ax1, ax2]))
            ys = np.unique(np.concatenate([ay1, ay2]))
            xi1 = np.searchsorted(xs, ax1)
            xi2 = np.searchsorted(xs, ax2)
            yi1 = np.searchsorted(ys, ay1)
            yi2 = np.searchsorted(ys, ay2)
            D = np.zeros((len(xs), len(ys)), np.int64)
            np.add.at(D, (xi1, yi1), 1)
            np.add.at(D, (xi1, yi2), -1)
            np.add.at(D, (xi2, yi1), -1)
            np.add.at(D, (xi2, yi2), 1)
            cov = D.cumsum(axis=0).cumsum(axis=1)[:-1, :-1] > 0
            w = np.diff(xs)[:, None]
            h = np.diff(ys)[None, :]
            rows.append((k, int((cov * (w * h)).sum()), int(len(gg))))
        if not rows:
            return pd.DataFrame({key: pd.Series(dtype=g[key].dtype),
                                 "area": pd.Series(dtype="int64"),
                                 "n_rects": pd.Series(dtype="int64")})
        out = pd.DataFrame(rows, columns=[key, "area", "n_rects"])
        out["area"] = out["area"].astype("int64")
        out["n_rects"] = out["n_rects"].astype("int64")
        return out

    from ..relational import grouped_apply_bucketed
    return grouped_apply_bucketed(ds, [key], per, num_buckets=num_buckets,
                                  whole_bucket=True)


def shoelace_stats(ds: ray.data.Dataset, key: str, order: str,
                   x: str, y: str,
                   num_buckets: int = 64) -> ray.data.Dataset:
    """Exact polygon area + area-weighted centroid per key from the
    shoelace formula over integer vertices in ring order: 2A = Σ
    (xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ) (wrapping), centroid = (Σ (xᵢ+xᵢ₊₁)·crossᵢ,
    Σ (yᵢ+yᵢ₊₁)·crossᵢ) / (3·2A) — everything carried as the
    unreduced integer triple (twice_area, cx_num, cy_num), no float.
    ONE keyed shuffle; inside the bucket the wrap-around pairs come
    from one roll per key done with flat index arithmetic.
    Returns (key, n_vertices, twice_area, cx_num, cy_num)."""
    def per(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({key: pd.Series(dtype=g[key].dtype),
                                 "n_vertices": pd.Series(dtype="int64"),
                                 "twice_area": pd.Series(dtype="int64"),
                                 "cx_num": pd.Series(dtype="int64"),
                                 "cy_num": pd.Series(dtype="int64")})
        g = g.sort_values([key, order], kind="mergesort",
                          ignore_index=True)
        kv = g[key].to_numpy()
        xv = g[x].to_numpy(np.int64)
        yv = g[y].to_numpy(np.int64)
        n = len(g)
        starts = np.concatenate([[0],
                                 np.nonzero(kv[1:] != kv[:-1])[0] + 1])
        ends = np.concatenate([starts[1:], [n]])
        sizes = ends - starts
        # next vertex with wrap: i+1, except last of key -> key start
        nxt = np.arange(1, n + 1)
        nxt[ends - 1] = starts
        cross = xv * yv[nxt] - xv[nxt] * yv
        gi = np.repeat(np.arange(len(starts)), sizes)
        A2 = np.bincount(gi, weights=cross).astype(np.int64)
        cxn = np.bincount(gi, weights=(xv + xv[nxt]) * cross) \
            .astype(np.int64)
        cyn = np.bincount(gi, weights=(yv + yv[nxt]) * cross) \
            .astype(np.int64)
        return pd.DataFrame({key: kv[starts],
                             "n_vertices": sizes.astype("int64"),
                             "twice_area": A2, "cx_num": cxn,
                             "cy_num": cyn})

    from ..relational import grouped_apply_bucketed
    return grouped_apply_bucketed(ds, [key], per, num_buckets=num_buckets,
                                  whole_bucket=True)
