"""Distributed DBSCAN vs a brute-force union-find oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _brute_dbscan(pts, eps, min_pts):
    n = len(pts)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    near = d2 <= eps * eps
    core = near.sum(1) >= min_pts
    parent = {i: i for i in np.flatnonzero(core)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in np.flatnonzero(core):
        for j in np.flatnonzero(core & near[i]):
            parent[find(i)] = find(j)
    comp = {}
    for i in np.flatnonzero(core):
        comp.setdefault(find(i), []).append(i)
    clu = {}
    for mem in comp.values():
        m = min(mem)
        for i in mem:
            clu[i] = m
    rows = []
    for i in range(n):
        if core[i]:
            rows.append((i, clu[i], 2))
        else:
            cn = np.flatnonzero(core & near[i])
            if len(cn):
                rows.append((i, clu[cn.min()], 1))
            else:
                rows.append((i, -1, 0))
    return pd.DataFrame(rows, columns=["id", "cluster", "role"]) \
        .astype("int64")


def _run(pts, eps, min_pts, ray_session):
    from hand_index_ray.pipelines.cluster import dbscan

    ids = np.arange(len(pts), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(ids),
        "x": pa.array(pts[:, 0]), "y": pa.array(pts[:, 1])})) \
        .repartition(4)
    return dbscan(ds, eps, min_pts, num_buckets=8).to_pandas() \
        .astype("int64").sort_values("id").reset_index(drop=True)


def test_dbscan_blobs_and_noise(ray_session):
    rng = np.random.default_rng(3)
    pts = np.vstack([
        rng.integers(0, 12, (40, 2)) + [10, 10],
        rng.integers(0, 12, (35, 2)) + [60, 40],
        rng.integers(0, 10, (30, 2)) + [30, 80],
        rng.integers(0, 120, (25, 2))]).astype(np.int64)
    got = _run(pts, 5, 5, ray_session)
    assert got.equals(_brute_dbscan(pts, 5, 5))
    assert set(got["role"]) == {0, 1, 2}  # all three roles exercised


def test_dbscan_all_noise_and_isolated_core(ray_session):
    # far-apart points: all noise at min_pts 3; one tight pair + min_pts 2
    pts = np.array([[0, 0], [100, 0], [0, 100], [100, 100],
                    [50, 50], [50, 51]], np.int64)
    got = _run(pts, 3, 3, ray_session)
    assert (got["cluster"] == -1).all() and (got["role"] == 0).all()
    got2 = _run(pts, 3, 2, ray_session)
    exp2 = _brute_dbscan(pts, 3, 2)
    assert got2.equals(exp2)
    assert (got2.loc[got2["id"].isin([4, 5]), "cluster"] == 4).all()
