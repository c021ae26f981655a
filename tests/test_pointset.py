"""Brute-force parity for pointset (closest pair, diameter) and the
Fréchet / rollup operators."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


def _pts_ds(rng, n_groups=6, lo=3, hi=40, span=50):
    rows = []
    for g in range(n_groups):
        n = int(rng.integers(lo, hi))
        xs = rng.integers(0, span, n)
        ys = rng.integers(0, span, n)
        for x, y in zip(xs, ys):
            rows.append((g, int(x), int(y)))
    df = pd.DataFrame(rows, columns=["gid", "x", "y"])
    return df, ray.data.from_pandas(df)


def test_closest_pair_brute(ray_session):
    from hand_index_ray.pipelines.pointset import closest_pair

    rng = np.random.default_rng(31)
    df, ds = _pts_ds(rng)
    got = closest_pair(ds, "gid", "x", "y").to_pandas() \
        .sort_values("gid").reset_index(drop=True)
    for _, row in got.iterrows():
        sub = df[df["gid"] == row["gid"]]
        p = sub[["x", "y"]].to_numpy()
        d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        iu = np.triu_indices(len(p), 1)
        assert row["d2_min"] == d2[iu].min()
        assert row["n_pts"] == len(p)
    assert set(got["gid"]) == set(df["gid"].unique())


def test_closest_pair_duplicates_and_singletons(ray_session):
    from hand_index_ray.pipelines.pointset import closest_pair

    df = pd.DataFrame({"gid": [0, 0, 0, 1, 2, 2],
                       "x": [5, 5, 9, 3, 0, 40],
                       "y": [7, 7, 1, 3, 0, 40]})
    got = closest_pair(ray.data.from_pandas(df), "gid", "x", "y") \
        .to_pandas().sort_values("gid").reset_index(drop=True)
    # gid 1 is a singleton: omitted; gid 0 has a duplicate pair: 0
    assert got["gid"].tolist() == [0, 2]
    assert got["d2_min"].tolist() == [0, 3200]


def test_diameter_brute(ray_session):
    from hand_index_ray.pipelines.pointset import diameter

    rng = np.random.default_rng(37)
    df, ds = _pts_ds(rng)
    got = diameter(ds, "gid", "x", "y").to_pandas() \
        .sort_values("gid").reset_index(drop=True)
    for _, row in got.iterrows():
        sub = df[df["gid"] == row["gid"]]
        p = sub[["x", "y"]].to_numpy()
        d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        iu = np.triu_indices(len(p), 1)
        assert row["d2_max"] == d2[iu].max()
        assert row["n_pairs_max"] == int((d2[iu] == d2[iu].max()).sum())


def test_diameter_collinear_and_identical(ray_session):
    from hand_index_ray.pipelines.pointset import diameter

    df = pd.DataFrame({"gid": [0] * 4 + [1] * 3,
                       "x": [0, 1, 2, 3, 5, 5, 5],
                       "y": [0, 1, 2, 3, 5, 5, 5]})
    got = diameter(ray.data.from_pandas(df), "gid", "x", "y") \
        .to_pandas().sort_values("gid").reset_index(drop=True)
    assert got["d2_max"].tolist() == [18, 0]
    assert got["n_pairs_max"].tolist() == [1, 3]


def _brute_frechet(track, tpl):
    n, m = len(track), len(tpl)
    d = np.array([[(ax - bx) ** 2 + (ay - by) ** 2
                   for bx, by in tpl] for ax, ay in track], np.int64)
    f = np.zeros((n, m), np.int64)
    for i in range(n):
        for j in range(m):
            if i == 0 and j == 0:
                f[i, j] = d[0, 0]
            elif i == 0:
                f[i, j] = max(d[0, j], f[0, j - 1])
            elif j == 0:
                f[i, j] = max(d[i, 0], f[i - 1, 0])
            else:
                f[i, j] = max(d[i, j], min(f[i - 1, j], f[i, j - 1],
                                           f[i - 1, j - 1]))
    return int(f[n - 1, m - 1])


def test_frechet_brute(ray_session):
    from hand_index_ray.pipelines.trajectory import frechet_to_template

    rng = np.random.default_rng(41)
    tpl = np.array([[5, 7], [20, 40], [45, 12], [60, 60]], np.int64)
    rows = []
    for g in range(5):
        n = int(rng.integers(1, 30))
        for i in range(n):
            rows.append((g, i, int(rng.integers(0, 64)),
                         int(rng.integers(0, 64))))
    df = pd.DataFrame(rows, columns=["gid", "ord", "x", "y"])
    got = frechet_to_template(ray.data.from_pandas(df), "gid", "ord",
                              "x", "y", tpl).to_pandas() \
        .sort_values("gid").reset_index(drop=True)
    for _, row in got.iterrows():
        sub = df[df["gid"] == row["gid"]].sort_values("ord")
        ref = _brute_frechet(sub[["x", "y"]].to_numpy(), tpl)
        assert row["frechet_d2"] == ref
        assert row["n_pts"] == len(sub)


def test_rollup_sums(ray_session):
    from hand_index_ray.relational import rollup_sums

    rng = np.random.default_rng(43)
    df = pd.DataFrame({"a": rng.choice(["x", "y"], 200),
                       "b": rng.choice(["p", "q", "r"], 200),
                       "v": rng.integers(0, 100, 200).astype("int64")})
    got = rollup_sums(ray.data.from_pandas(df), ["a", "b"], "v")
    fine = df.groupby(["a", "b"])["v"].agg(["sum", "size"])
    assert len(got) == len(fine) + df["a"].nunique() + 1
    tot = got[(got["a"] == "ALL") & (got["b"] == "ALL")]
    assert tot["sum_v"].iloc[0] == df["v"].sum()
    assert tot["n_rows"].iloc[0] == 200
    for (a, b), r in fine.iterrows():
        m = got[(got["a"] == a) & (got["b"] == b)]
        assert m["sum_v"].iloc[0] == r["sum"]
        assert m["n_rows"].iloc[0] == r["size"]
    for a, r in df.groupby("a")["v"].agg(["sum", "size"]).iterrows():
        m = got[(got["a"] == a) & (got["b"] == "ALL")]
        assert m["sum_v"].iloc[0] == r["sum"]


def _brute_dtw(track, tpl):
    n, m = len(track), len(tpl)
    d = np.array([[(ax - bx) ** 2 + (ay - by) ** 2
                   for bx, by in tpl] for ax, ay in track], np.int64)
    big = np.int64(1) << 60
    f = np.full((n + 1, m + 1), big, np.int64)
    f[0, 0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            f[i, j] = d[i - 1, j - 1] + min(f[i - 1, j], f[i, j - 1],
                                            f[i - 1, j - 1])
    return int(f[n, m])


def test_dtw_brute(ray_session):
    from hand_index_ray.pipelines.trajectory import dtw_to_template

    rng = np.random.default_rng(47)
    tpl = np.array([[3, 9], [30, 22], [50, 50], [9, 60]], np.int64)
    rows = []
    for g in range(6):
        n = int(rng.integers(1, 30))
        for i in range(n):
            rows.append((g, i, int(rng.integers(0, 64)),
                         int(rng.integers(0, 64))))
    df = pd.DataFrame(rows, columns=["gid", "ord", "x", "y"])
    got = dtw_to_template(ray.data.from_pandas(df), "gid", "ord",
                          "x", "y", tpl).to_pandas() \
        .sort_values("gid").reset_index(drop=True)
    for _, row in got.iterrows():
        sub = df[df["gid"] == row["gid"]].sort_values("ord")
        ref = _brute_dtw(sub[["x", "y"]].to_numpy(), tpl)
        assert row["dtw_d2"] == ref
        assert row["n_pts"] == len(sub)


def _brute_lcss(track, tpl, eps):
    n, m = len(track), len(tpl)
    f = np.zeros((n + 1, m + 1), np.int64)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            ax, ay = track[i - 1]
            bx, by = tpl[j - 1]
            if abs(ax - bx) <= eps and abs(ay - by) <= eps:
                f[i, j] = f[i - 1, j - 1] + 1
            else:
                f[i, j] = max(f[i - 1, j], f[i, j - 1])
    return int(f[n, m])


def test_lcss_brute(ray_session):
    from hand_index_ray.pipelines.trajectory import lcss_to_template

    rng = np.random.default_rng(83)
    tpl = np.array([[10, 10], [25, 30], [40, 15], [55, 50]], np.int64)
    rows = []
    for g in range(6):
        n = int(rng.integers(1, 30))
        for i in range(n):
            rows.append((g, i, int(rng.integers(0, 64)),
                         int(rng.integers(0, 64))))
    df = pd.DataFrame(rows, columns=["gid", "ord", "x", "y"])
    got = lcss_to_template(ray.data.from_pandas(df), "gid", "ord",
                           "x", "y", tpl, eps=6).to_pandas() \
        .sort_values("gid").reset_index(drop=True)
    for _, row in got.iterrows():
        sub = df[df["gid"] == row["gid"]].sort_values("ord")
        ref = _brute_lcss(sub[["x", "y"]].to_numpy(), tpl, 6)
        assert row["lcss_len"] == ref
        assert row["n_pts"] == len(sub)


def test_resample_tracks_vs_brute(ray_session):
    import ray.data
    from hand_index_ray.pipelines.trajectory import resample_tracks

    rng = np.random.RandomState(5)
    rows = []
    for g in range(6):
        npts = rng.randint(1, 9)
        ts = np.sort(rng.choice(np.arange(0, 200), npts, replace=False))
        for t in ts:
            rows.append((g, int(t), int(rng.randint(-50, 50)),
                         int(rng.randint(-50, 50))))
    t = pa.table({"g": pa.array([r[0] for r in rows], pa.int64()),
                  "t": pa.array([r[1] for r in rows], pa.int64()),
                  "x": pa.array([r[2] for r in rows], pa.int64()),
                  "y": pa.array([r[3] for r in rows], pa.int64())})
    STEP = 7
    got = resample_tracks(ray.data.from_arrow(t), "g", "t", "x", "y",
                          step=STEP).to_pandas()
    gm = {(r.g, r.tick): (r.xi, r.yi) for r in got.itertuples()}
    exp = {}
    bygrp = {}
    for g, tt, x, y in rows:
        bygrp.setdefault(g, []).append((tt, x, y))
    for g, pts in bygrp.items():
        pts.sort()
        tmin, tmax = pts[0][0], pts[-1][0]
        T = -(-tmin // STEP) * STEP
        while T <= tmax:
            i = max(j for j in range(len(pts)) if pts[j][0] <= T)
            ta, xa, ya = pts[i]
            if i + 1 < len(pts) and T > ta:
                tb, xb, yb = pts[i + 1]
                xi = xa + (xb - xa) * (T - ta) // (tb - ta)
                yi = ya + (yb - ya) * (T - ta) // (tb - ta)
            else:
                xi, yi = xa, ya
            exp[(g, T)] = (xi, yi)
            T += STEP
    assert gm == exp


def test_linear_reference_vs_brute(ray_session):
    import ray.data
    from hand_index_ray.pipelines.trajectory import linear_reference

    rng = np.random.RandomState(37)
    rows = []
    for g in range(5):
        npts = rng.randint(1, 8)
        ts = np.sort(rng.choice(np.arange(50), npts, replace=False))
        for t in ts:
            rows.append((g, int(t), int(rng.randint(0, 40)),
                         int(rng.randint(0, 40))))
    t = pa.table({"g": pa.array([r[0] for r in rows], pa.int64()),
                  "t": pa.array([r[1] for r in rows], pa.int64()),
                  "x": pa.array([r[2] for r in rows], pa.int64()),
                  "y": pa.array([r[3] for r in rows], pa.int64())})
    got = linear_reference(ray.data.from_arrow(t), "g", "t", "x", "y",
                           fractions=[1, 3], denom=4).to_pandas()
    gm = {(r.g, r.frac_num): (r.px, r.py) for r in got.itertuples()}
    byg = {}
    for g, tt, x, y in rows:
        byg.setdefault(g, []).append((tt, x, y))
    for g, pts in byg.items():
        pts.sort()
        seg = [abs(pts[i + 1][1] - pts[i][1])
               + abs(pts[i + 1][2] - pts[i][2])
               for i in range(len(pts) - 1)]
        tot = sum(seg)
        for p in (1, 3):
            tgt = tot * p // 4
            pr, i = 0, 0
            while i < len(seg) and pr + seg[i] <= tgt:
                pr += seg[i]
                i += 1
            # engine picks the LAST vertex with pref <= target
            while i + 1 < len(pts) and pr == tgt and i < len(seg) \
                    and seg[i] == 0:
                i += 1
            if i >= len(seg):
                exp = (pts[-1][1], pts[-1][2])
            else:
                d = tgt - pr
                sl = max(seg[i], 1)
                exp = (pts[i][1] + (pts[i + 1][1] - pts[i][1]) * d // sl,
                       pts[i][2] + (pts[i + 1][2] - pts[i][2]) * d // sl)
            assert gm[(g, p)] == exp, (g, p)


def test_shoelace_vs_brute(ray_session):
    import ray.data
    from fractions import Fraction

    from hand_index_ray.pipelines.geostat import shoelace_stats

    # unit square CCW: area 1, centroid (.5, .5)
    t = pa.table({"g": pa.array([1] * 4, pa.int64()),
                  "i": pa.array(range(4), pa.int64()),
                  "x": pa.array([0, 1, 1, 0], pa.int64()),
                  "y": pa.array([0, 0, 1, 1], pa.int64())})
    got = shoelace_stats(ray.data.from_arrow(t), "g", "i", "x", "y") \
        .to_pandas().set_index("g")
    r = got.loc[1]
    assert r["twice_area"] == 2
    assert Fraction(int(r["cx_num"]), 3 * 2) == Fraction(1, 2)
    assert Fraction(int(r["cy_num"]), 3 * 2) == Fraction(1, 2)
