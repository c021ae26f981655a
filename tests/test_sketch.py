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
