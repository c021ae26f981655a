"""HyperLogLog sketch tests: accuracy, mergeability, Ray integration."""

import numpy as np
import pytest

from hand_index_ray.kernels import sketch


def test_hll_accuracy_across_cardinalities():
    for n in (100, 5000, 200_000):
        reg = sketch.empty()
        sketch.add(reg, np.arange(n, dtype=np.int64))
        est = sketch.estimate(reg)
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_equals_union():
    a = sketch.empty()
    b = sketch.empty()
    sketch.add(a, np.arange(0, 60_000, dtype=np.int64))
    sketch.add(b, np.arange(40_000, 100_000, dtype=np.int64))  # overlap
    m = sketch.merge(a, b)
    est = sketch.estimate(m)
    assert abs(est - 100_000) / 100_000 < 0.05
    # merge is idempotent and commutative
    np.testing.assert_array_equal(sketch.merge(a, b), sketch.merge(b, a))
    np.testing.assert_array_equal(sketch.merge(m, m), m)


def test_hll_string_values():
    reg = sketch.empty()
    sketch.add(reg, [f"doc-{i}" for i in range(20_000)])
    est = sketch.estimate(reg)
    assert abs(est - 20_000) / 20_000 < 0.05


def test_sparse_state_exact_below_threshold():
    """Sparse regime = the true distinct count (splitmix64 is a
    bijection on uint64, so integer inputs cannot collide)."""
    st = sketch.state_empty()
    vals = np.array([7, 7, 3, 3, 3, 99999999999, -5], dtype=np.int64)
    st = sketch.state_add(st, vals)
    assert st[0] == "sparse"
    assert sketch.state_estimate(st) == 4.0
    # adding the same values again changes nothing
    st2 = sketch.state_add(st, vals)
    assert sketch.state_estimate(st2) == 4.0
    # strings too
    ss = sketch.state_add(sketch.state_empty(), ["a", "b", "a", "c"])
    assert sketch.state_estimate(ss) == 3.0


def test_sparse_state_promotes_to_dense_consistently():
    """Promotion at SPARSE_MAX must land on the same dense registers a
    direct dense build produces, in every add/merge order."""
    n = sketch.SPARSE_MAX + 500
    vals = np.arange(n, dtype=np.int64)
    st = sketch.state_add(sketch.state_empty(), vals)
    assert st[0] == "dense"
    direct = sketch.empty()
    sketch.add(direct, vals)
    np.testing.assert_array_equal(st[1], direct)
    # sparse+sparse merge crossing the threshold promotes identically
    a = sketch.state_add(sketch.state_empty(), vals[: n // 2])
    b = sketch.state_add(sketch.state_empty(), vals[n // 2:])
    assert a[0] == "sparse" and b[0] == "sparse"
    m = sketch.state_merge(a, b)
    assert m[0] == "dense"
    np.testing.assert_array_equal(m[1], direct)
    # mixed sparse+dense merge
    m2 = sketch.state_merge(b, st)
    assert m2[0] == "dense"
    np.testing.assert_array_equal(m2[1], direct)


def test_state_serialize_round_trip():
    sp = sketch.state_add(sketch.state_empty(), np.arange(10, dtype=np.int64))
    rt = sketch.state_deserialize(sketch.state_serialize(sp))
    assert rt[0] == "sparse"
    np.testing.assert_array_equal(rt[1], sp[1])
    dn = sketch.state_add(sketch.state_empty(),
                          np.arange(sketch.SPARSE_MAX + 10, dtype=np.int64))
    rt2 = sketch.state_deserialize(sketch.state_serialize(dn))
    assert rt2[0] == "dense"
    np.testing.assert_array_equal(rt2[1], dn[1])


def test_approx_distinct_exact_regime(ray_session):
    """Distributed approx_distinct is EXACT (not just close) when every
    partial and the merged state stay sparse."""
    import pyarrow as pa

    import ray.data

    from hand_index_ray.relational import approx_distinct

    vals = np.arange(2000, dtype=np.int64) % 1234
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)
    assert approx_distinct(ds, "v") == 1234.0


def test_approx_distinct_vs_exact(ray_session):
    import duckdb
    import ray.data

    from hand_index_ray.relational import approx_distinct

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/lineitem.parquet")
    est = approx_distinct(ds, "l_orderkey")
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05


def test_quantile_sketch_accuracy_and_merge():
    import numpy as np

    from hand_index_ray.kernels import sketch

    rng = np.random.default_rng(5)
    data = rng.lognormal(3.0, 1.0, 200_000)
    # build from 37 shuffled partials, merged pairwise
    states = []
    for chunk in np.array_split(data, 37):
        states.append(sketch.q_add(sketch.q_empty(), chunk))
    st = sketch.q_empty()
    for s in states:
        st = sketch.q_merge(st, s)
    qs = np.array([0.01, 0.25, 0.5, 0.9, 0.99])
    got = sketch.q_quantile(st, qs)
    truth = np.quantile(data, qs)
    # rank error bound: the VALUE at the estimated rank must be within
    # 1% rank of the true quantile
    ranks = np.searchsorted(np.sort(data), got) / len(data)
    assert np.all(np.abs(ranks - qs) < 0.01), (ranks, qs)
    # serialization round-trip
    st2 = sketch.q_deserialize(sketch.q_serialize(st))
    np.testing.assert_array_equal(sketch.q_quantile(st2, qs), got)
    assert st2[2] == len(data)


def test_approx_quantiles_dataset(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from hand_index_ray.relational import approx_quantiles

    rng = np.random.default_rng(9)
    vals = rng.normal(100.0, 15.0, 50_000)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(16)
    got = approx_quantiles(ds, "v", [0.5, 0.9])
    truth = np.quantile(vals, [0.5, 0.9])
    assert np.all(np.abs(got - truth) < 1.5)  # ~0.1 sigma at these qs
