"""As-of and range (interval) join tests: shuffle path vs broadcast
path vs an independent driver-side reference, plus the exactly-once
property under long intervals."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def time_tables(ray_session):
    rng = np.random.default_rng(42)
    n_l, n_r, n_keys = 800, 300, 12
    left = pd.DataFrame({
        "lid": np.arange(n_l, dtype=np.int64),
        "k": rng.integers(0, n_keys, n_l).astype(np.int64),
        "t": rng.integers(0, 100_000, n_l).astype(np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys + 3, n_r).astype(np.int64),  # some keys unmatched
        "t": rng.integers(0, 100_000, n_r).astype(np.int64),
        "v": rng.normal(size=n_r),
    }).drop_duplicates(subset=["k", "t"]).reset_index(drop=True)
    return left, right


def _ref_asof(left: pd.DataFrame, right: pd.DataFrame, how: str) -> pd.DataFrame:
    r = right.sort_values("t", kind="mergesort").assign(t_r=lambda d: d["t"])
    out = pd.merge_asof(left.sort_values("t", kind="mergesort"), r,
                        on="t", by="k", direction="backward",
                        suffixes=("", "_r"))
    if how == "inner":
        out = out[out["t_r"].notna()]
    return out.sort_values("lid").reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_asof_join_matches_reference(time_tables, how):
    import ray.data

    from hand_index_ray import relational as rel

    left, right = time_tables
    lds = ray.data.from_pandas(left).repartition(8)
    rds = ray.data.from_pandas(right).repartition(4)
    out = rel.asof_join(lds, rds, on="t", by="k", how=how, num_buckets=16) \
        .to_pandas().sort_values("lid").reset_index(drop=True)
    ref = _ref_asof(left, right, how)
    pd.testing.assert_frame_equal(
        out[["lid", "k", "t", "v", "t_r"]].reset_index(drop=True),
        ref[["lid", "k", "t", "v", "t_r"]],
        check_dtype=(how == "inner"))  # left join: all-null buckets may widen


def test_asof_join_broadcast_equals_shuffle(time_tables):
    import ray.data

    from hand_index_ray import relational as rel

    left, right = time_tables
    lds = ray.data.from_pandas(left).repartition(8)
    rds = ray.data.from_pandas(right)
    shuf = rel.asof_join(lds, rds, on="t", by="k", how="inner") \
        .to_pandas().sort_values("lid").reset_index(drop=True)
    bc = rel.asof_join(lds, rds, on="t", by="k", how="inner",
                       broadcast_right=pa.Table.from_pandas(right)) \
        .to_pandas().sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(shuf[sorted(shuf.columns)],
                                  bc[sorted(bc.columns)])


def _ref_range(left: pd.DataFrame, iv: pd.DataFrame) -> pd.DataFrame:
    out = left.merge(iv, on="k")
    out = out[(out["t"] >= out["s"]) & (out["t"] <= out["e"])]
    return out[["lid", "iid"]].sort_values(["lid", "iid"]).reset_index(drop=True)


def test_range_join_matches_reference_and_exactly_once(ray_session):
    """Interval lengths straddle the bucket width (some spans cover
    many windows): result equals the brute-force pair set with no
    duplicate emission."""
    import ray.data

    from hand_index_ray import relational as rel

    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "lid": np.arange(600, dtype=np.int64),
        "k": rng.integers(0, 8, 600).astype(np.int64),
        "t": rng.integers(0, 50_000, 600).astype(np.int64),
    })
    iv = pd.DataFrame({
        "iid": np.arange(120, dtype=np.int64),
        "k": rng.integers(0, 8, 120).astype(np.int64),
        "s": rng.integers(0, 50_000, 120).astype(np.int64),
    })
    iv["e"] = iv["s"] + rng.integers(10, 20_000, 120)  # many >> bucket width
    lds = ray.data.from_pandas(left).repartition(6)
    ids = ray.data.from_pandas(iv).repartition(3)
    out = rel.range_join(lds, ids, key="k", on="t", start="s", end="e",
                         num_buckets=16, bucket_width_us=1_000) \
        .to_pandas()[["lid", "iid"]].sort_values(["lid", "iid"]) \
        .reset_index(drop=True)
    assert not out.duplicated().any()  # exactly-once emission
    pd.testing.assert_frame_equal(out, _ref_range(left, iv))


def test_range_join_broadcast_and_auto_width(ray_session):
    import ray.data

    from hand_index_ray import relational as rel

    rng = np.random.default_rng(3)
    left = pd.DataFrame({
        "lid": np.arange(200, dtype=np.int64),
        "k": rng.integers(0, 5, 200).astype(np.int64),
        "t": rng.integers(0, 10_000, 200).astype(np.int64),
    })
    iv = pd.DataFrame({
        "iid": np.arange(40, dtype=np.int64),
        "k": rng.integers(0, 5, 40).astype(np.int64),
        "s": rng.integers(0, 10_000, 40).astype(np.int64),
    })
    iv["e"] = iv["s"] + rng.integers(1, 500, 40)
    lds = ray.data.from_pandas(left).repartition(4)
    ids = ray.data.from_pandas(iv)
    ref = _ref_range(left, iv)
    auto = rel.range_join(lds, ids, key="k", on="t", start="s", end="e") \
        .to_pandas()[["lid", "iid"]].sort_values(["lid", "iid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(auto, ref)  # default width = max interval
    bc = rel.range_join(lds, ids, key="k", on="t", start="s", end="e",
                        broadcast_right=pa.Table.from_pandas(iv)) \
        .to_pandas()[["lid", "iid"]].sort_values(["lid", "iid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, ref)


def test_asof_join_resolve_dups(ray_session):
    """resolve_dups='max' equals pre-aggregating the right side."""
    import ray.data

    from hand_index_ray import relational as rel

    rng = np.random.default_rng(1)
    left = pd.DataFrame({"lid": np.arange(100, dtype=np.int64),
                         "k": rng.integers(0, 4, 100).astype(np.int64),
                         "t": rng.integers(0, 1_000, 100).astype(np.int64)})
    right = pd.DataFrame({"k": rng.integers(0, 4, 200).astype(np.int64),
                          "t": rng.integers(0, 1_000, 200).astype(np.int64) // 50 * 50,  # force dups
                          "v": rng.normal(size=200)})
    assert right.duplicated(subset=["k", "t"]).any()
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(2)
    got = rel.asof_join(lds, rds, on="t", by="k", how="inner",
                        resolve_dups="max").to_pandas() \
        .sort_values("lid").reset_index(drop=True)
    pre = right.groupby(["k", "t"], as_index=False).max()
    want = _ref_asof(left, pre, "inner")
    pd.testing.assert_frame_equal(got[["lid", "k", "t", "v", "t_r"]],
                                  want[["lid", "k", "t", "v", "t_r"]])


def test_nearest_join_vs_brute(ray_session):
    import ray.data
    from hand_index_ray.relational import nearest_join

    rng = np.random.RandomState(19)
    nl, nr = 80, 60
    lk = rng.randint(0, 4, nl)
    lt = rng.choice(np.arange(0, 500), nl, replace=False).astype(np.int64)
    lid = np.arange(nl, dtype=np.int64)
    rk = rng.randint(0, 4, nr)
    rt = rng.choice(np.arange(0, 500), nr, replace=False).astype(np.int64)
    rv = rng.randint(0, 100, nr).astype(np.int64)
    # make exact-distance ties possible: right times at +-d around some
    # left times
    left = ray.data.from_arrow(pa.table({
        "u": pa.array(lk, pa.int64()), "t": pa.array(lt, pa.int64()),
        "lid": pa.array(lid, pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "u": pa.array(rk, pa.int64()), "t": pa.array(rt, pa.int64()),
        "rv": pa.array(rv, pa.int64())}))
    got = nearest_join(left, right, on="t", by="u",
                       left_cols=["lid"], right_cols=["rv"]).to_pandas()
    gm = {r.lid: (r.t_r, r.rv_r) for r in got.itertuples()}
    exp = {}
    for i in range(nl):
        cand = [(abs(int(rt[j]) - int(lt[i])), int(rt[j]), int(rv[j]))
                for j in range(nr) if rk[j] == lk[i]]
        if cand:
            d, t, v = min(cand)
            exp[int(lid[i])] = (t, v)
    assert gm == exp


def test_locf_grid_vs_brute(ray_session):
    import ray.data
    from hand_index_ray.relational import locf_grid

    rows = [(1, 3, 10), (1, 12, 20), (1, 31, 5),
            (2, 40, 7)]
    t = pa.table({"k": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows], pa.int64()),
                  "v": pa.array([r[2] for r in rows], pa.int64())})
    got = locf_grid(ray.data.from_arrow(t), "k", "ts", "v", step=10) \
        .to_pandas()
    gm = sorted(map(tuple, got[["k", "tick", "v"]].to_numpy().tolist()))
    assert gm == [(1, 10, 10), (1, 20, 20), (1, 30, 20),
                  (2, 40, 7)]
