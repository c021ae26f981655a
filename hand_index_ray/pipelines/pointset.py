"""Per-group point-set geometry: closest pair and diameter.

Two classic computational-geometry reductions, each expressed so the
engine does asymptotically LESS work than the all-pairs oracle that
checks it:

- ``closest_pair``: grid-bucket pruning. A cheap vectorized pass
  yields a per-group upper bound d_ub (min over x-sort-consecutive
  pairs); with cell side s = ceil(sqrt(d_ub)) the true closest pair
  must fall in 3×3-neighboring cells, so only those candidate pairs
  are materialized. Worst case (all points coincident) degrades to
  the pair count of the dense cell — documented, never wrong.
- ``diameter``: quickhull-style prefilter. The farthest pair are hull
  vertices; every point STRICTLY inside the quadrilateral of the four
  axis-extreme points is eliminated vectorized, then the surviving
  (typically near-hull-sized) set is self-joined per group.

Scale shape: one keyed shuffle each (``grouped_apply_bucketed``);
all per-bucket math is pandas/numpy vectorized across groups — no
per-group Python loops, no driver materialization.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def closest_pair(ds: ray.data.Dataset, key: str, x: str, y: str,
                 num_buckets: int = 64) -> ray.data.Dataset:
    """Per-group closest pair of points (squared Euclidean, exact
    int64). Returns (key, d2_min, n_pts) for groups with ≥2 points."""
    from ..relational import grouped_apply_bucketed

    def per(g: pd.DataFrame) -> pd.DataFrame:
        g = g[[key, x, y]].copy()
        g[x] = g[x].astype(np.int64)
        g[y] = g[y].astype(np.int64)
        cnt = g.groupby(key)[x].transform("size")
        g = g[cnt >= 2]
        if not len(g):
            return pd.DataFrame({key: pd.Series(dtype=g[key].dtype),
                                 "d2_min": pd.Series(dtype="int64"),
                                 "n_pts": pd.Series(dtype="int64")})
        g = g.sort_values([key, x, y], kind="mergesort") \
             .reset_index(drop=True)
        kv = g[key].to_numpy()
        xs = g[x].to_numpy()
        ys = g[y].to_numpy()
        same = kv[1:] == kv[:-1]
        dd = (xs[1:] - xs[:-1]) ** 2 + (ys[1:] - ys[:-1]) ** 2
        ub = pd.Series(dd[same], index=kv[1:][same]).groupby(level=0).min()
        # cell side s >= true min distance  =>  the pair lands in
        # 3x3-neighboring cells
        s = np.ceil(np.sqrt(ub.to_numpy().astype(np.float64))) \
            .astype(np.int64)
        s = np.maximum(s, 1)
        smap = pd.Series(s, index=ub.index)
        sg = smap.reindex(kv).to_numpy()
        g["__cx"] = xs // sg
        g["__cy"] = ys // sg
        g["__i"] = np.arange(len(g))
        best = None
        right = g.rename(columns={x: "__xr", y: "__yr", "__i": "__ir"})
        for ox in (-1, 0, 1):
            for oy in (-1, 0, 1):
                lhs = g[[key, x, y, "__cx", "__cy", "__i"]].copy()
                lhs["__cx"] += ox
                lhs["__cy"] += oy
                mm = lhs.merge(
                    right[[key, "__xr", "__yr", "__cx", "__cy", "__ir"]],
                    on=[key, "__cx", "__cy"], how="inner")
                mm = mm[mm["__i"] < mm["__ir"]]
                if not len(mm):
                    continue
                d2 = ((mm[x] - mm["__xr"]) ** 2
                      + (mm[y] - mm["__yr"]) ** 2)
                part = d2.groupby(mm[key].to_numpy()).min()
                best = part if best is None else \
                    pd.concat([best, part]).groupby(level=0).min()
        n = g.groupby(key)[x].size()
        out = pd.DataFrame({key: best.index,
                            "d2_min": best.to_numpy().astype(np.int64),
                            "n_pts": n.reindex(best.index).to_numpy()
                            .astype(np.int64)})
        return out.reset_index(drop=True)

    return grouped_apply_bucketed(ds, [key], per, num_buckets=num_buckets,
                                  whole_bucket=True)


def _cross(ax, ay, bx, by, px, py):
    """z of (b−a) × (p−a), int64."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def diameter(ds: ray.data.Dataset, key: str, x: str, y: str,
             num_buckets: int = 64) -> ray.data.Dataset:
    """Per-group diameter: max squared distance over all pairs, plus
    the count of unordered pairs achieving it. Quadrilateral prefilter
    (points strictly inside the 4-extreme quadrilateral cannot be hull
    vertices, hence not diameter endpoints) then a survivor self-join.
    Returns (key, d2_max, n_pairs_max, n_pts) for groups with ≥2
    points."""
    from ..relational import grouped_apply_bucketed

    def per(g: pd.DataFrame) -> pd.DataFrame:
        g = g[[key, x, y]].copy()
        g[x] = g[x].astype(np.int64)
        g[y] = g[y].astype(np.int64)
        cnt = g.groupby(key)[x].transform("size")
        g = g[cnt >= 2].reset_index(drop=True)
        if not len(g):
            return pd.DataFrame({key: pd.Series(dtype=g[key].dtype),
                                 "d2_max": pd.Series(dtype="int64"),
                                 "n_pairs_max": pd.Series(dtype="int64"),
                                 "n_pts": pd.Series(dtype="int64")})
        n = g.groupby(key)[x].size()
        # four axis extremes per group (ties resolved by idxmin/idxmax
        # — any extreme point works for the containment filter)
        gb = g.groupby(key)
        quad = {}
        for tag, col, fn in (("A", x, "idxmin"), ("B", y, "idxmin"),
                             ("C", x, "idxmax"), ("D", y, "idxmax")):
            idx = getattr(gb[col], fn)()
            quad[tag + "x"] = g[x].to_numpy()[idx.to_numpy()]
            quad[tag + "y"] = g[y].to_numpy()[idx.to_numpy()]
        q = pd.DataFrame(quad, index=n.index)
        qq = q.reindex(g[key]).reset_index(drop=True)
        px = g[x].to_numpy()
        py = g[y].to_numpy()
        # CCW order xmin -> ymin -> xmax -> ymax; strictly inside all
        # 4 edges => eliminable (zero-length edges give cross 0 =>
        # never "strictly inside" => safe on degenerate quads)
        inside = np.ones(len(g), bool)
        ring = ("A", "B", "C", "D")
        for i in range(4):
            a, b = ring[i], ring[(i + 1) % 4]
            cr = _cross(qq[a + "x"].to_numpy(), qq[a + "y"].to_numpy(),
                        qq[b + "x"].to_numpy(), qq[b + "y"].to_numpy(),
                        px, py)
            inside &= cr > 0
        surv = g[~inside].copy()
        surv["__i"] = np.arange(len(surv))
        mm = surv.merge(surv, on=key, suffixes=("_l", "_r"))
        mm = mm[mm["__i_l"] < mm["__i_r"]]
        d2 = ((mm[x + "_l"] - mm[x + "_r"]) ** 2
              + (mm[y + "_l"] - mm[y + "_r"]) ** 2).to_numpy()
        kk = mm[key].to_numpy()
        mx = pd.Series(d2, index=kk).groupby(level=0).max()
        at = pd.Series((d2 == mx.reindex(kk).to_numpy()).astype(np.int64),
                       index=kk).groupby(level=0).sum()
        return pd.DataFrame({key: mx.index,
                             "d2_max": mx.to_numpy().astype(np.int64),
                             "n_pairs_max": at.to_numpy().astype(np.int64),
                             "n_pts": n.reindex(mx.index).to_numpy()
                             .astype(np.int64)}).reset_index(drop=True)

    return grouped_apply_bucketed(ds, [key], per, num_buckets=num_buckets,
                                  whole_bucket=True)
