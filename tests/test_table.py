"""Table maintenance: CDC merge/upsert and SCD2 history build
(pipelines/table.py; driver queries q171/q172 carry the SQL oracles)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hand_index_ray.pipelines import table as tbl


def _base(rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "v": pa.array([r[1] for r in rows], pa.int64()),
    })).repartition(2)


def _changes(rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "v": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()),
        "tb": pa.array([r[3] for r in rows], pa.int64()),
        "op": pa.array([r[4] for r in rows], pa.string()),
    })).repartition(2)


def test_merge_upsert_semantics(ray_session):
    base = _base([(1, 10), (2, 20), (3, 30), (4, 40)])
    # k=1 updated twice (latest ts wins); k=2 deleted; k=3 updated then
    # deleted then re-upserted (latest wins); k=5 inserted; k=4 untouched
    ch = _changes([
        (1, 11, 100, 1, "U"), (1, 12, 200, 2, "U"),
        (2, 99, 100, 3, "D"),
        (3, 31, 100, 4, "U"), (3, 0, 200, 5, "D"), (3, 33, 300, 6, "U"),
        (5, 50, 100, 7, "U"),
    ])
    out = tbl.merge_upsert(base, ch, key="k", ts="ts",
                           tiebreak="tb", op="op", num_buckets=4)
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert df["k"].tolist() == [1, 3, 4, 5]
    assert df["v"].tolist() == [12, 33, 40, 50]


def test_merge_upsert_ts_tie_breaks_on_tiebreak(ray_session):
    base = _base([(1, 10)])
    ch = _changes([(1, 111, 100, 2, "U"), (1, 222, 100, 9, "U")])
    out = tbl.merge_upsert(base, ch, key="k", ts="ts",
                           tiebreak="tb", op="op", num_buckets=2)
    assert out.to_pandas()["v"].tolist() == [222]


def test_merge_upsert_empty_changes_passthrough(ray_session):
    base = _base([(7, 70), (8, 80)])
    ch = _changes([])
    out = tbl.merge_upsert(base, ch, key="k", ts="ts",
                           tiebreak="tb", op="op", num_buckets=2)
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert df["k"].tolist() == [7, 8]
    assert df["v"].tolist() == [70, 80]


def _scd_changes(rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "tb": pa.array([r[2] for r in rows], pa.int64()),
        "attr": pa.array([r[3] for r in rows], pa.int64()),
    })).repartition(2)


def test_scd2_collapses_unchanged_and_builds_intervals(ray_session):
    ch = _scd_changes([
        # key 1: A at 100, A again at 200 (collapsed), B at 300
        (1, 100, 1, 7), (1, 200, 2, 7), (1, 300, 3, 8),
        # key 2: single row -> one open interval
        (2, 50, 4, 9),
    ])
    out = tbl.scd2(ch, key="k", ts="ts", tiebreak="tb", attr="attr",
                   num_buckets=4)
    df = out.to_pandas().sort_values(["k", "valid_from"]) \
        .reset_index(drop=True)
    assert df.values.tolist() == [
        [1, 7, 100, 300],
        [1, 8, 300, -1],
        [2, 9, 50, -1],
    ]


def test_scd2_ts_ties_ordered_by_tiebreak(ray_session):
    ch = _scd_changes([(1, 100, 5, 2), (1, 100, 3, 1)])
    out = tbl.scd2(ch, key="k", ts="ts", tiebreak="tb", attr="attr",
                   num_buckets=2)
    df = out.to_pandas().sort_values("valid_to").reset_index(drop=True)
    # tb=3 (attr 1) comes first, closed by tb=5's interval at same ts
    assert df[["attr", "valid_from", "valid_to"]].values.tolist() == [
        [2, 100, -1], [1, 100, 100]]


def test_table_diff_classifies_churn(ray_session):
    a = _base([(1, 10), (2, 20), (3, 30), (4, 40)])
    b = _base([(1, 10), (2, 99), (4, 40), (5, 50)])  # 3 removed, 5 added
    from hand_index_ray.pipelines.table import table_diff

    df = table_diff(a, b, key="k", num_buckets=4).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert df.values.tolist() == [[2, "changed"], [3, "removed"],
                                  [5, "added"]]


def test_table_diff_identical_tables_empty(ray_session):
    a = _base([(1, 10), (2, 20)])
    b = _base([(2, 20), (1, 10)])
    from hand_index_ray.pipelines.table import table_diff

    assert table_diff(a, b, key="k", num_buckets=2).count() == 0
