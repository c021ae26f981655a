"""Table-maintenance operators: CDC merge/upsert and SCD2 history build.

The reference engine rebuilds its catalog from scratch on every load
(`/root/reference/load.py` drops + recreates the hand_index tables); a
100 TB catalog cannot be rebuilt per delta, so these operators apply a
change stream incrementally:

* :func:`merge_upsert` — Delta-``MERGE INTO``-style apply: the latest
  change per key wins (deletes drop the key, upserts replace the row,
  unseen keys insert). One slim-row hash shuffle on the key; the
  per-bucket resolution is a single vectorized sort + keep-last pass.
* :func:`scd2` — slowly-changing-dimension type-2 history: collapse a
  change stream to the rows where the tracked attribute actually
  changed and emit validity intervals ``[valid_from, valid_to)`` with
  ``valid_to = -1`` for the open (current) interval.

Scale shape: both are one ``grouped_apply_bucketed`` shuffle keyed on
the merge key — rows of one key land in one bucket, buckets process as
whole-frame vectorized pandas (no per-group Python dispatch). At 100 TB
the change stream is typically ≪ the base table; the union still only
moves each row once.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .. import relational as rel

_TS_BASE = np.int64(np.iinfo(np.int64).min)  # base rows sort before any change


def merge_upsert(base: ray.data.Dataset, changes: ray.data.Dataset,
                 key: str, ts: str, tiebreak: str, op: str,
                 num_buckets: int = 64) -> ray.data.Dataset:
    """Apply a CDC change stream to a base table (latest change wins).

    ``base`` columns: ``[key, *values]`` (PK-unique on ``key``).
    ``changes`` columns: ``[key, *values, ts, tiebreak, op]`` where
    ``op`` is ``'U'`` (upsert) or ``'D'`` (delete). ``ts`` must be
    int64 (epoch units); ties break on ``tiebreak``.

    Returns a Dataset with the base schema: one row per surviving key.
    """
    val_cols = [c for c in base.schema().names if c != key]

    def prep_base(t: pa.Table) -> pa.Table:
        n = t.num_rows
        t = t.select([key] + val_cols)
        return (t.append_column("__ts", pa.array(
                    np.full(n, _TS_BASE), pa.int64()))
                 .append_column("__tb", pa.array(
                     np.full(n, -1, dtype=np.int64), pa.int64()))
                 .append_column("__op", pa.array(["U"] * n, pa.string())))

    def prep_ch(t: pa.Table) -> pa.Table:
        out = t.select([key] + val_cols)
        return (out.append_column("__ts", pc.cast(t.column(ts),
                                                          pa.int64()))
                   .append_column("__tb", pc.cast(t.column(tiebreak),
                                                          pa.int64()))
                   .append_column("__op", pc.cast(t.column(op),
                                                          pa.string())))

    u = base.map_batches(prep_base, batch_format="pyarrow").union(
        changes.map_batches(prep_ch, batch_format="pyarrow"))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return g[[key] + val_cols]
        g = g.sort_values([key, "__ts", "__tb"], kind="mergesort")
        last = g.drop_duplicates(subset=[key], keep="last")
        live = last[last["__op"] != "D"]
        return live[[key] + val_cols].reset_index(drop=True)

    return rel.grouped_apply_bucketed(u, [key], resolve,
                                      num_buckets=num_buckets,
                                      whole_bucket=True)


def scd2(changes: ray.data.Dataset, key: str, ts: str, tiebreak: str,
         attr: str, num_buckets: int = 64) -> ray.data.Dataset:
    """Build SCD type-2 validity intervals from a change stream.

    Rows are ordered per key by ``(ts, tiebreak)``; consecutive rows
    with an unchanged ``attr`` collapse into one interval. Output:
    ``(key, attr, valid_from, valid_to)`` int64, ``valid_to = -1`` for
    the open interval. ``ts`` must already be int64 epoch units.
    """
    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            key: pc.cast(t.column(key), pa.int64()),
            "__ts": pc.cast(t.column(ts), pa.int64()),
            "__tb": pc.cast(t.column(tiebreak), pa.int64()),
            attr: pc.cast(t.column(attr), pa.int64()),
        })

    empty = pd.DataFrame({key: pd.Series([], dtype="int64"),
                          attr: pd.Series([], dtype="int64"),
                          "valid_from": pd.Series([], dtype="int64"),
                          "valid_to": pd.Series([], dtype="int64")})

    def build(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return empty
        g = g.sort_values([key, "__ts", "__tb"], kind="mergesort")
        k = g[key].to_numpy()
        a = g[attr].to_numpy()
        t = g["__ts"].to_numpy()
        new_key = np.empty(len(g), dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        changed = new_key.copy()
        changed[1:] |= a[1:] != a[:-1]
        kk, ka, kt = k[changed], a[changed], t[changed]
        knew = new_key[changed]
        valid_to = np.empty(len(kk), dtype=np.int64)
        valid_to[:-1] = kt[1:]
        valid_to[-1] = -1
        # last interval of each key is open
        last_of_key = np.empty(len(kk), dtype=bool)
        last_of_key[:-1] = knew[1:]
        last_of_key[-1] = True
        valid_to[last_of_key] = -1
        return pd.DataFrame({key: kk, attr: ka,
                             "valid_from": kt, "valid_to": valid_to})

    return rel.grouped_apply_bucketed(
        changes.map_batches(prep, batch_format="pyarrow"), [key], build,
        num_buckets=num_buckets, whole_bucket=True)


def table_diff(a: ray.data.Dataset, b: ray.data.Dataset, key: str,
               num_buckets: int = 64) -> ray.data.Dataset:
    """Version diff of two PK-unique tables with identical schemas:
    one hash shuffle on ``key`` co-locates both sides, then a
    vectorized boundary pass classifies every key as ``added`` (only
    in ``b``), ``removed`` (only in ``a``) or ``changed`` (both sides,
    any value column differs). Unchanged keys are dropped — at 100 TB
    the diff output is proportional to the churn, not the table.

    Output: ``(key, status)``.
    """
    val_cols = [c for c in a.schema().names if c != key]

    def tag(src: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__src", pa.array(np.full(t.num_rows, src,
                                          dtype=np.int64), pa.int64()))
        return fn

    u = a.map_batches(tag(0), batch_format="pyarrow").union(
        b.map_batches(tag(1), batch_format="pyarrow"))

    empty = pd.DataFrame({key: pd.Series([], dtype="int64"),
                          "status": pd.Series([], dtype="object")})

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return empty
        g = g.sort_values([key, "__src"], kind="mergesort")
        k = g[key].to_numpy()
        first = np.empty(len(g), dtype=bool)
        first[0] = True
        first[1:] = k[1:] != k[:-1]
        last = np.empty(len(g), dtype=bool)
        last[:-1] = first[1:]
        last[-1] = True
        single = first & last
        src = g["__src"].to_numpy()
        out_k, out_s = [], []
        # singles: src 0 → removed, src 1 → added
        out_k.append(k[single & (src == 0)])
        out_s.append(np.full((single & (src == 0)).sum(), "removed",
                             dtype=object))
        out_k.append(k[single & (src == 1)])
        out_s.append(np.full((single & (src == 1)).sum(), "added",
                             dtype=object))
        # pairs: first row is src 0, next is src 1 (sorted) — compare
        pf = first & ~last
        idx = np.flatnonzero(pf)
        if len(idx):
            diff = np.zeros(len(idx), dtype=bool)
            for c in val_cols:
                v = g[c].to_numpy()
                diff |= v[idx] != v[idx + 1]
            out_k.append(k[idx[diff]])
            out_s.append(np.full(int(diff.sum()), "changed",
                                 dtype=object))
        return pd.DataFrame({key: np.concatenate(out_k),
                             "status": np.concatenate(out_s)})

    return rel.grouped_apply_bucketed(u, [key], classify,
                                      num_buckets=num_buckets,
                                      whole_bucket=True)
