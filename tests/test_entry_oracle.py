"""Driver-contract test: every queries() entry runs at sf0.001; those
with an oracle_sql() entry must match DuckDB row-for-row
(order-insensitive, column-name aligned) — a local mirror of the
driver's CORRECTNESS gate."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import importlib.util

    spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(entry_mod):
    res = entry_mod.entry()
    df = _to_df(res)
    assert len(df) >= 1
    assert "image_id" in df.columns


def _oracle_names():
    import importlib.util

    spec = importlib.util.spec_from_file_location("__ray_entry__x", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return sorted(mod.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_vs_oracle(entry_mod, con, name):
    qfn = entry_mod.queries()[name]
    got = _canon(_to_df(qfn(SF_DIR)))
    truth = _canon(con.execute(entry_mod.oracle_sql()[name]).fetch_df())
    assert list(got.columns) == list(truth.columns), (
        f"{name} columns: {list(got.columns)} vs {list(truth.columns)}")
    assert len(got) == len(truth), f"{name} rows: {len(got)} vs {len(truth)}"
    for c in got.columns:
        # driver-parity: its value hash is dtype-sensitive — an int64
        # column on one side and float64 on the other (e.g. DuckDB
        # SUM(BIGINT)→HUGEINT→float64) hash-mismatches even when values
        # are numerically equal. Require matching kinds.
        gk = got[c].dtype.kind
        tk = truth[c].dtype.kind
        assert (gk == tk) or {gk, tk} <= {"i", "u"}, (
            f"{name}.{c} dtype kind: ray={got[c].dtype} oracle={truth[c].dtype}")
        if np.issubdtype(got[c].dtype, np.floating) or np.issubdtype(truth[c].dtype, np.floating):
            np.testing.assert_allclose(
                got[c].astype(float).to_numpy(), truth[c].astype(float).to_numpy(),
                rtol=0, atol=0, err_msg=f"{name}.{c}")
        else:
            assert (got[c].to_numpy() == truth[c].to_numpy()).all() or \
                got[c].astype(str).equals(truth[c].astype(str)), f"{name}.{c}"


# Queries documented as genuinely non-SQL-expressible (driver records a
# rows-only check; parity pinned by dedicated tests instead). Keep this
# list MINIMAL — every other queries() entry must ship a DuckDB oracle
# (VERDICT r1 item 2).
NO_ORACLE_ALLOWED = set()  # empty since r4: q119 gained a frozen-fixture
                           # oracle (tests/data/h3_golden_tpch.parquet)


def test_every_query_has_an_oracle(entry_mod):
    """Driver-coverage invariant: every queries() entry ships a DuckDB
    oracle except the explicit non-SQL-expressible allowlist, and no
    oracle exists without its query."""
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q
    assert q - o == NO_ORACLE_ALLOWED
