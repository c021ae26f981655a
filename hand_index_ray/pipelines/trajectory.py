"""Trajectory analytics over point streams (GPS traces, track logs).

Stay-point detection is the standard first stage of trajectory mining
(segmenting a trace into moves and dwells before map-matching or
visit inference). All arithmetic is integer so results are exact and
SQL-oracle-comparable.

Scale shape: points shuffle ONCE on hash(trajectory key) — each
trajectory is analyzed locally inside its bucket (the same
partitioning contract as sessionization); no global sort, no
driver-side state.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def staypoint_stats(ds: ray.data.Dataset, key: str, order: str,
                    x: str, y: str, window: int, radius: int,
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Stay-point anchors per trajectory: point ``t`` is an anchor iff
    the next ``window`` points (inclusive) all lie within Chebyshev
    ``radius`` of it — max(|xi−xt|, |yi−yt|) ≤ radius for
    i ∈ [t, t+window) — and the window is complete (t ≤ T−window).
    Sliding extrema via stride-tricks windows; integer-exact.

    Returns one row per trajectory WITH at least one anchor:
    (key, n_stay, idx_sum, first_stay).
    """
    from numpy.lib.stride_tricks import sliding_window_view

    from ..relational import grouped_apply_bucketed

    def per(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        xs = g[x].to_numpy().astype(np.int64)
        ys = g[y].to_numpy().astype(np.int64)
        empty = pd.DataFrame({key: pd.Series([], dtype=g[key].dtype),
                              "n_stay": pd.Series([], dtype="int64"),
                              "idx_sum": pd.Series([], dtype="int64"),
                              "first_stay": pd.Series([], dtype="int64")})
        if len(xs) < window:
            return empty
        wx = sliding_window_view(xs, window)
        wy = sliding_window_view(ys, window)
        anc = xs[:len(wx)]
        anc_y = ys[:len(wy)]
        ok = ((wx.max(axis=1) - anc <= radius)
              & (anc - wx.min(axis=1) <= radius)
              & (wy.max(axis=1) - anc_y <= radius)
              & (anc_y - wy.min(axis=1) <= radius))
        idx = np.flatnonzero(ok)
        if len(idx) == 0:
            return empty
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n_stay": [len(idx)],
                             "idx_sum": [int(idx.sum())],
                             "first_stay": [int(idx[0])]})

    return grouped_apply_bucketed(ds, [key], per, num_buckets=num_buckets)
