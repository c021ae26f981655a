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


def frechet_to_template(ds: ray.data.Dataset, key: str, order: str,
                        x: str, y: str, template: "np.ndarray",
                        num_buckets: int = 64) -> ray.data.Dataset:
    """Discrete Fréchet distance (squared, integer — Eiter–Mannila
    coupling DP) from each trajectory to a small broadcast template
    polyline: dF(i,j) = max(d²(aᵢ,bⱼ), min(dF(i−1,j), dF(i,j−1),
    dF(i−1,j−1))). The template length m is fixed and small, so the
    DP unrolls over j and runs as ONE lockstep wave per point index
    across every trajectory in the bucket — (G, m) state arrays, no
    per-trajectory Python loop. One keyed shuffle; returns
    (key, frechet_d2, n_pts)."""
    from ..relational import grouped_apply_bucketed

    tpl = np.asarray(template, dtype=np.int64)
    m = len(tpl)
    big = np.int64(1) << 60

    def per(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order], kind="mergesort")
        keys_arr = g[key].to_numpy()
        xs = g[x].to_numpy().astype(np.int64)
        ys = g[y].to_numpy().astype(np.int64)
        uk, start = np.unique(keys_arr, return_index=True)
        G = len(uk)
        if G == 0:
            return pd.DataFrame({key: pd.Series(dtype=g[key].dtype),
                                 "frechet_d2": pd.Series(dtype="int64"),
                                 "n_pts": pd.Series(dtype="int64")})
        sizes = np.diff(np.append(start, len(g)))
        L = int(sizes.max())
        pos = np.arange(len(g)) - np.repeat(start, sizes)
        gi = np.repeat(np.arange(G), sizes)
        # (G, L, m) squared distances to the template points, padded
        d = np.full((G, L, m), big, np.int64)
        for j in range(m):
            d[gi, pos, j] = (xs - tpl[j, 0]) ** 2 + (ys - tpl[j, 1]) ** 2
        alive = np.zeros((G, L), bool)
        alive[gi, pos] = True
        # i = 0 row: dF(1, j) = cummax_j d(a1, bj)
        f = np.maximum.accumulate(d[:, 0, :], axis=1)
        for i in range(1, L):
            di = d[:, i, :]
            m_ = alive[:, i]
            nf = np.empty_like(f)
            nf[:, 0] = np.maximum(di[:, 0], f[:, 0])
            for j in range(1, m):
                nf[:, j] = np.maximum(
                    di[:, j],
                    np.minimum(np.minimum(f[:, j], f[:, j - 1]),
                               nf[:, j - 1]))
            f = np.where(m_[:, None], nf, f)
        return pd.DataFrame({key: uk,
                             "frechet_d2": f[:, m - 1].astype(np.int64),
                             "n_pts": sizes.astype(np.int64)})

    return grouped_apply_bucketed(ds, [key], per, num_buckets=num_buckets,
                                  whole_bucket=True)


def dtw_to_template(ds: ray.data.Dataset, key: str, order: str,
                    x: str, y: str, template: "np.ndarray",
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Dynamic time warping distance (classic Sakoe–Chiba DP, sum of
    squared point distances, exact int64) from each trajectory to a
    small broadcast template: D(i,j) = d²(aᵢ,bⱼ) + min(D(i−1,j),
    D(i,j−1), D(i−1,j−1)). Same lockstep shape as
    ``frechet_to_template`` — the fixed template axis unrolls, one
    vectorized wave per point index across every trajectory in the
    bucket. Returns (key, dtw_d2, n_pts)."""
    from ..relational import grouped_apply_bucketed

    tpl = np.asarray(template, dtype=np.int64)
    m = len(tpl)
    big = np.int64(1) << 60

    def per(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order], kind="mergesort")
        keys_arr = g[key].to_numpy()
        xs = g[x].to_numpy().astype(np.int64)
        ys = g[y].to_numpy().astype(np.int64)
        uk, start = np.unique(keys_arr, return_index=True)
        G = len(uk)
        if G == 0:
            return pd.DataFrame({key: pd.Series(dtype=g[key].dtype),
                                 "dtw_d2": pd.Series(dtype="int64"),
                                 "n_pts": pd.Series(dtype="int64")})
        sizes = np.diff(np.append(start, len(g)))
        L = int(sizes.max())
        pos = np.arange(len(g)) - np.repeat(start, sizes)
        gi = np.repeat(np.arange(G), sizes)
        d = np.full((G, L, m), big, np.int64)
        for j in range(m):
            d[gi, pos, j] = (xs - tpl[j, 0]) ** 2 + (ys - tpl[j, 1]) ** 2
        alive = np.zeros((G, L), bool)
        alive[gi, pos] = True
        # i = 0 row: D(1, j) = cumsum_j d(a1, bj); padded rows stay big
        f = np.where(alive[:, 0, None],
                     np.cumsum(np.where(alive[:, 0, None], d[:, 0, :], 0),
                               axis=1), big)
        for i in range(1, L):
            di = d[:, i, :]
            m_ = alive[:, i]
            nf = np.empty_like(f)
            nf[:, 0] = di[:, 0] + f[:, 0]
            for j in range(1, m):
                nf[:, j] = di[:, j] + np.minimum(
                    np.minimum(f[:, j], f[:, j - 1]), nf[:, j - 1])
            f = np.where(m_[:, None], nf, f)
        return pd.DataFrame({key: uk,
                             "dtw_d2": f[:, m - 1].astype(np.int64),
                             "n_pts": sizes.astype(np.int64)})

    return grouped_apply_bucketed(ds, [key], per, num_buckets=num_buckets,
                                  whole_bucket=True)


def lcss_to_template(ds: ray.data.Dataset, key: str, order: str,
                     x: str, y: str, template: "np.ndarray", eps: int,
                     num_buckets: int = 64) -> ray.data.Dataset:
    """Longest common subsequence (LCSS) similarity to a broadcast
    template under a Chebyshev ε-match (|Δx| ≤ eps AND |Δy| ≤ eps) —
    the noise-robust sibling of DTW (skips outliers instead of paying
    for them): L(i,j) = L(i−1,j−1)+1 on match else max(L(i−1,j),
    L(i,j−1)). Same lockstep shape as ``dtw_to_template``. Returns
    (key, lcss_len, n_pts)."""
    from ..relational import grouped_apply_bucketed

    tpl = np.asarray(template, dtype=np.int64)
    m = len(tpl)

    def per(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order], kind="mergesort")
        keys_arr = g[key].to_numpy()
        xs = g[x].to_numpy().astype(np.int64)
        ys = g[y].to_numpy().astype(np.int64)
        uk, start = np.unique(keys_arr, return_index=True)
        G = len(uk)
        if G == 0:
            return pd.DataFrame({key: pd.Series(dtype=g[key].dtype),
                                 "lcss_len": pd.Series(dtype="int64"),
                                 "n_pts": pd.Series(dtype="int64")})
        sizes = np.diff(np.append(start, len(g)))
        L = int(sizes.max())
        pos = np.arange(len(g)) - np.repeat(start, sizes)
        gi = np.repeat(np.arange(G), sizes)
        mt = np.zeros((G, L, m), bool)
        for j in range(m):
            mt[gi, pos, j] = ((np.abs(xs - tpl[j, 0]) <= eps)
                              & (np.abs(ys - tpl[j, 1]) <= eps))
        alive = np.zeros((G, L), bool)
        alive[gi, pos] = True
        f = np.zeros((G, m), np.int64)
        for i in range(L):
            mi = mt[:, i, :]
            nf = np.empty_like(f)
            # j = 0: L(i−1, j−1) is the all-zero column
            nf[:, 0] = np.where(mi[:, 0], 1, f[:, 0])
            for j in range(1, m):
                nf[:, j] = np.where(mi[:, j], f[:, j - 1] + 1,
                                    np.maximum(f[:, j], nf[:, j - 1]))
            f = np.where(alive[:, i, None], nf, f)
        return pd.DataFrame({key: uk,
                             "lcss_len": f[:, m - 1].astype(np.int64),
                             "n_pts": sizes.astype(np.int64)})

    return grouped_apply_bucketed(ds, [key], per, num_buckets=num_buckets,
                                  whole_bucket=True)


def resample_tracks(ds: ray.data.Dataset, key: str, t: str, x: str,
                    y: str, step: int,
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Resample every trajectory at the fixed global tick grid
    T ∈ step·ℤ, keeping ticks inside [t_first, t_last]: position at T
    is the floor-exact linear interpolation of the bracketing points
    (xi = x_a + (x_b − x_a)(T − t_a) // (t_b − t_a)) — the GPS-track
    normalization pass every fleet/AIS pipeline runs before
    map-matching. Timestamps must be unique per key.

    ONE keyed shuffle; inside the bucket all groups resolve in flat
    passes: points sort once by (key, t), per-key tick COUNTS come
    from the key's min/max, ticks materialize with one repeat/arange,
    and one global searchsorted on segment-shifted timestamps brackets
    every tick at once — no per-key loop. Returns (key, tick, xi, yi).
    """
    def per(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({key: pd.Series(dtype=g[key].dtype),
                              "tick": pd.Series(dtype="int64"),
                              "xi": pd.Series(dtype="int64"),
                              "yi": pd.Series(dtype="int64")})
        if len(g) == 0:
            return empty
        g = g.sort_values([key, t], kind="mergesort", ignore_index=True)
        kv = g[key].to_numpy()
        tv = g[t].to_numpy(np.int64)
        xv = g[x].to_numpy(np.int64)
        yv = g[y].to_numpy(np.int64)
        n = len(g)
        starts = np.concatenate(
            [[0], np.nonzero(kv[1:] != kv[:-1])[0] + 1])
        ends = np.concatenate([starts[1:], [n]])
        tmin = tv[starts]
        tmax = tv[ends - 1]
        # first/last tick per key (ceil/floor to the step grid)
        t0 = -(-tmin // step) * step
        t1 = (tmax // step) * step
        cnt = np.maximum(0, (t1 - t0) // step + 1)
        if cnt.sum() == 0:
            return empty
        gi = np.repeat(np.arange(len(starts)), cnt)
        base = np.repeat(t0, cnt)
        offs = np.arange(len(gi)) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        ticks = base + offs * step
        # bracket: one global searchsorted on segment-shifted times
        span = int(tv.max() - tv.min()) + step + 2
        comp_pts = np.arange(len(starts)).repeat(ends - starts) * span \
            + (tv - tv.min())
        comp_tk = gi * span + (ticks - tv.min())
        ia = np.searchsorted(comp_pts, comp_tk, side="right") - 1
        xa, ya, ta = xv[ia], yv[ia], tv[ia]
        last = ia == np.repeat(ends, cnt) - 1
        ib = np.where(last, ia, ia + 1)
        dt = np.where(last, 1, tv[ib] - ta)
        xi = xa + (xv[ib] - xa) * (ticks - ta) // dt
        yi = ya + (yv[ib] - ya) * (ticks - ta) // dt
        return pd.DataFrame({key: kv[starts][gi], "tick": ticks,
                             "xi": xi.astype("int64"),
                             "yi": yi.astype("int64")})

    from ..relational import grouped_apply_bucketed
    return grouped_apply_bucketed(ds, [key], per, num_buckets=num_buckets,
                                  whole_bucket=True)


def linear_reference(ds: ray.data.Dataset, key: str, order: str,
                     x: str, y: str, fractions: list[int],
                     denom: int, num_buckets: int = 64) -> ray.data.Dataset:
    """Linear referencing (locate-along-measure): for each polyline
    and each requested fraction p/denom of its TOTAL L1 (Manhattan)
    length, the exact point that far along the line — chainage in L1
    keeps every quantity integer (the euclidean measure needs sqrt;
    the oracle mirrors the same metric). Position interpolates
    floor-exact inside the containing segment. Lines with zero length
    report their first vertex at every fraction.

    ONE keyed shuffle; per bucket: per-key L1 prefix sums, one flat
    searchsorted per fraction to find the containing segment, floor
    interpolation — no per-key loop. Returns (key, frac_num, px, py).
    """
    def per(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({key: pd.Series(dtype=g[key].dtype),
                              "frac_num": pd.Series(dtype="int64"),
                              "px": pd.Series(dtype="int64"),
                              "py": pd.Series(dtype="int64")})
        if len(g) == 0:
            return empty
        g = g.sort_values([key, order], kind="mergesort",
                          ignore_index=True)
        kv = g[key].to_numpy()
        xv = g[x].to_numpy(np.int64)
        yv = g[y].to_numpy(np.int64)
        n = len(g)
        starts = np.concatenate([[0],
                                 np.nonzero(kv[1:] != kv[:-1])[0] + 1])
        ends = np.concatenate([starts[1:], [n]])
        seg = np.abs(np.diff(xv)) + np.abs(np.diff(yv))
        seg = np.append(seg, 0)
        seg[ends - 1] = 0                      # no segment across keys
        cum = np.cumsum(seg) - seg             # length BEFORE vertex i+1?
        # prefix length at vertex i (start of key = 0)
        pref = np.cumsum(np.concatenate([[0], seg[:-1]]))
        pref = pref - pref[starts].repeat(ends - starts)
        total = np.zeros(len(starts), np.int64)
        np.add.at(total, np.repeat(np.arange(len(starts)),
                                   ends - starts), seg)
        rows = []
        G = len(starts)
        span = pref.max() + 2 if n else 2
        comp_pref = np.repeat(np.arange(G), ends - starts) * span + pref
        for p in fractions:
            target = total * p // denom        # L1 distance along
            comp_t = np.arange(G) * span + target
            ia = np.searchsorted(comp_pref, comp_t, side="right") - 1
            d = target - pref[ia]
            sl = seg[ia]
            sl = np.maximum(sl, 1)
            dx = np.where(ia + 1 < ends, xv[np.minimum(ia + 1, n - 1)]
                          - xv[ia], 0)
            dy = np.where(ia + 1 < ends, yv[np.minimum(ia + 1, n - 1)]
                          - yv[ia], 0)
            px = xv[ia] + dx * d // sl
            py = yv[ia] + dy * d // sl
            rows.append(pd.DataFrame({key: kv[starts],
                                      "frac_num": np.full(G, p,
                                                          np.int64),
                                      "px": px.astype("int64"),
                                      "py": py.astype("int64")}))
        return pd.concat(rows, ignore_index=True)

    from ..relational import grouped_apply_bucketed
    return grouped_apply_bucketed(ds, [key], per, num_buckets=num_buckets,
                                  whole_bucket=True)
