"""Generic relational operators over Ray Data, Arrow-batch-first.

These re-express the reference's embedded-SQL relational surface
(SURVEY.md §2: joins J2–J4, aggregations A1–A4, distinct, limit/top-k
O1–O3) as reusable Ray Data building blocks, with the scale rules
baked in:

- **Pre-aggregate before the shuffle**: ``grouped_agg`` computes
  per-batch partials with Arrow's hash kernels (one row per key per
  batch) and only then runs the (tiny) global ``groupby().aggregate``.
- **Broadcast the small side**: ``broadcast_join`` / ``semi_join`` put
  the dimension table in the object store once (``ray.put``) and join
  inside ``map_batches`` — no shuffle of the big side.
- **Top-k without a global sort**: per-batch local top-k, then one
  small driver-side merge.

Float discipline for oracle parity: multi-row float sums are computed
on integer-scaled values (cents) so results are bit-exact regardless of
summation order; unaggregated per-row float math is IEEE-deterministic
and needs no rounding.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def grouped_agg(ds: ray.data.Dataset, keys: list[str],
                sum_cols: list[str] | None = None,
                count: bool = True,
                min_cols: list[str] | None = None,
                max_cols: list[str] | None = None) -> ray.data.Dataset:
    """groupby + sum/count/min/max with per-batch partial aggregation.

    The partial pass emits ≤ |keys-cardinality| rows per input batch,
    so the all-to-all exchange moves partials, not rows (the reference
    leans on DuckDB to do this internally; in Ray Data it is explicit,
    SURVEY.md §7.3)."""
    sum_cols = sum_cols or []
    min_cols = min_cols or []
    max_cols = max_cols or []

    def partial(t: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols] + [(c, "min") for c in min_cols] + [(c, "max") for c in max_cols]
        if count:
            aggs.append((keys[0], "count"))
        g = t.group_by(keys).aggregate(aggs)
        names = list(g.column_names)
        # normalize partial names: col_sum → col, key_count → __cnt
        ren = {}
        for c in sum_cols:
            ren[f"{c}_sum"] = c
        for c in min_cols:
            ren[f"{c}_min"] = f"__min_{c}"
        for c in max_cols:
            ren[f"{c}_max"] = f"__max_{c}"
        if count:
            ren[f"{keys[0]}_count"] = "__cnt"
        return g.rename_columns([ren.get(n, n) for n in names])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    aggs += [Min(f"__min_{c}", alias_name=f"__min_{c}") for c in min_cols]
    aggs += [Max(f"__max_{c}", alias_name=f"__max_{c}") for c in max_cols]
    if count:
        aggs.append(Sum("__cnt", alias_name="__cnt"))
    out = partials.groupby(keys).aggregate(*aggs)

    def finish(t: pa.Table) -> pa.Table:
        names = []
        for n in t.column_names:
            if n == "__cnt":
                names.append("n")
            elif n.startswith("__min_"):
                names.append(f"min_{n[6:]}")
            elif n.startswith("__max_"):
                names.append(f"max_{n[6:]}")
            else:
                names.append(n)
        return t.rename_columns(names)

    return out.map_batches(finish, batch_format="pyarrow")


def broadcast_join(big: ray.data.Dataset, small: pa.Table, keys: list[str] | str,
                   join_type: str = "inner",
                   small_prefix: str = "") -> ray.data.Dataset:
    """Join a large Dataset against a small Arrow table without a
    shuffle: the small side ships to the object store once and each
    batch joins locally (reference J2/J3 pattern, SURVEY.md §2.4)."""
    ref = ray.put(small)
    keys = [keys] if isinstance(keys, str) else list(keys)

    class Joiner:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            jt = {"inner": "inner", "left": "left outer"}.get(join_type, join_type)
            return t.join(self.small, keys=keys, join_type=jt,
                          right_suffix=small_prefix or None)

    return big.map_batches(Joiner, batch_format="pyarrow", zero_copy_batch=True,
                           concurrency=(1, 8))


def semi_join(big: ray.data.Dataset, key: str, values: pa.Array,
              anti: bool = False) -> ray.data.Dataset:
    """Semi/anti join by broadcast key set (reference J4,
    query_geojson.py:221-233)."""
    ref = ray.put(values)

    def f(t: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        m = pc.is_in(t[key], value_set=vs)
        if anti:
            m = pc.invert(m)
        return t.filter(m)

    return big.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def distinct(ds: ray.data.Dataset, keys: list[str]) -> ray.data.Dataset:
    """DISTINCT on key columns: per-batch local dedup (Arrow hash
    group_by) then a global groupby — the shuffle moves unique keys
    only (reference A4b, ``SELECT DISTINCT`` at load.py:212)."""

    def local(t: pa.Table) -> pa.Table:
        return t.select(keys).group_by(keys).aggregate([])

    return ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True) \
             .groupby(keys).count().drop_columns(["count()"])


def dedup_first(ds: ray.data.Dataset, key: str, order_col: str) -> ray.data.Dataset:
    """Exact dedup keeping the row with min(order_col) per key
    (deterministic analog of the reference's dict-first /
    ON CONFLICT DO NOTHING, load.py:84-86,192-196)."""

    def take_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col, kind="stable").head(1)

    return ds.groupby(key).map_groups(take_first, batch_format="pandas")


def topk(ds: ray.data.Dataset, col: str, k: int, descending: bool = True,
         tiebreak: str | None = None) -> pd.DataFrame:
    """Top-k without a global sort: local top-k per batch, merge on the
    driver (the candidate set is ≤ k × num_batches rows)."""
    by = [col] + ([tiebreak] if tiebreak else [])
    asc = [not descending] + ([True] if tiebreak else [])

    def local(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(by, ascending=asc, kind="stable").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    return parts.sort_values(by, ascending=asc, kind="stable").head(k).reset_index(drop=True)


def tumbling_window(ds: ray.data.Dataset, ts_col: str, keys: list[str],
                    window_s: int, sum_cents_col: str | None = None) -> ray.data.Dataset:
    """Streaming-shaped tumbling-window aggregate: window id =
    floor(epoch/window) computed per batch, then grouped_agg. Ray Data
    has no event-time runtime (SURVEY.md §2.9) — windows over a batch
    table are a grouped aggregate by construction."""

    def widx(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.int64()).to_numpy()  # µs since epoch
        w = ts // (window_s * 1_000_000)
        return t.append_column("window_id", pa.array(w, pa.int64()))

    withw = ds.map_batches(widx, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_agg(withw, keys + ["window_id"],
                       sum_cols=[sum_cents_col] if sum_cents_col else [])


def add_cents(ds: ray.data.Dataset, col: str, out: str, scale: int = 100) -> ray.data.Dataset:
    """Integer-scale a float column so downstream sums are order-exact
    (see module docstring float discipline)."""

    def f(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t[col], float(scale))), pa.int64())
        return t.append_column(out, v)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
