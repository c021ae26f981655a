"""Distributed DBSCAN over integer point sets.

Density-based clustering composed from this engine's own distributed
primitives — no global state, no driver-side point data:

1. **Core detection**: points shuffle ONCE on their eps-grid home
   cell, each point replicated to the 8 neighbor cells as a ghost
   (every eps-ball lives inside a 3×3 cell block); a cell group
   counts, for its HOME points only, the neighbors within eps² (self
   included — the sklearn convention) → core flags.
2. **Core graph**: the flagged points explode the same way again;
   each cell emits core-core edges within eps² exactly once (only
   the smaller id's home cell emits a pair — both homes see the pair
   because eps-neighbors share the 3×3 block), plus a self-edge per
   core so isolated cores keep a component. Border points emit their
   anchor = MINIMUM core neighbor id (the deterministic variant of
   DBSCAN's ambiguous border assignment).
3. **Clusters**: connected_components (pipelines/graph.py raw-task
   min-label waves) over the core graph; cluster id = min core id in
   the component. Borders join their anchor's cluster through one
   more bucketed join; everything else is noise (cluster −1).

Scale shape: shuffle payloads are slim (cell, id, x, y[, flag]) rows
×9; per-cell work is bounded by local density (pick eps-sized cells;
salt pathological cells upstream); the CC waves move labels, never
points.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_OFF = 1 << 30


def _explode9(cell: int, extra: "list[str]"):
    """Map-batches fn: 9 rows per point — (cellkey, home, id, x, y,
    *extra)."""
    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        base = {"cell": pa.array([], pa.int64()),
                "home": pa.array([], pa.int8()),
                "id": pa.array([], pa.int64()),
                "x": pa.array([], pa.int64()),
                "y": pa.array([], pa.int64())}
        for e in extra:
            base[e] = pa.array([], pa.int8())
        if n == 0:
            return pa.table(base)
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        ids = t.column("id").to_numpy().astype(np.int64)
        cx = x // cell
        cy = y // cell
        dx = np.array([-1, 0, 1] * 3, np.int64)
        dy = np.repeat(np.array([-1, 0, 1], np.int64), 3)
        CX = (cx[:, None] + dx[None, :]).ravel()
        CY = (cy[:, None] + dy[None, :]).ravel()
        home = np.tile((dx == 0) & (dy == 0), n).astype(np.int8)
        rep = np.repeat(np.arange(n), 9)
        out = {"cell": pa.array((CX + _OFF) * (1 << 32) + (CY + _OFF),
                                pa.int64()),
               "home": pa.array(home, pa.int8()),
               "id": pa.array(ids[rep], pa.int64()),
               "x": pa.array(x[rep], pa.int64()),
               "y": pa.array(y[rep], pa.int64())}
        for e in extra:
            out[e] = pa.array(
                t.column(e).to_numpy().astype(np.int8)[rep], pa.int8())
        return pa.table(out)
    return fn


def dbscan(points: ray.data.Dataset, eps: int, min_pts: int,
           num_buckets: int = 64) -> ray.data.Dataset:
    """DBSCAN over Dataset[(id, x, y)] (int64, squared-Euclidean
    metric, radius² = eps²). Returns Dataset[(id, cluster, role)]:
    role 2 = core, 1 = border, 0 = noise; cluster = min core id of
    the cluster, −1 for noise; borders join the cluster of their
    minimum core neighbor."""
    from ..relational import grouped_apply_bucketed
    from .graph import connected_components

    eps2 = int(eps) * int(eps)

    def core_flags(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id": pd.Series([], dtype="int64"),
                              "x": pd.Series([], dtype="int64"),
                              "y": pd.Series([], dtype="int64"),
                              "core": pd.Series([], dtype="int8")})
        if len(g) == 0:
            return empty
        h = g[g["home"] == 1]
        if len(h) == 0:
            return empty
        hx = h["x"].to_numpy(); hy = h["y"].to_numpy()
        ax = g["x"].to_numpy(); ay = g["y"].to_numpy()
        d2 = (hx[:, None] - ax[None, :]) ** 2 \
            + (hy[:, None] - ay[None, :]) ** 2
        cnt = (d2 <= eps2).sum(axis=1)  # self included (home row is
        # also present as its own ghostless group member)
        return pd.DataFrame({"id": h["id"].to_numpy(),
                             "x": hx, "y": hy,
                             "core": (cnt >= min_pts).astype(np.int8)})

    flagged = grouped_apply_bucketed(
        points.map_batches(_explode9(eps, []), batch_format="pyarrow"),
        ["cell"], core_flags, num_buckets=num_buckets)

    def edges_anchors(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"kind": pd.Series([], dtype="int8"),
                              "a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64")})
        if len(g) == 0:
            return empty
        h = g[g["home"] == 1]
        if len(h) == 0:
            return empty
        ax = g["x"].to_numpy(); ay = g["y"].to_numpy()
        aid = g["id"].to_numpy(); acore = g["core"].to_numpy()
        hx = h["x"].to_numpy(); hy = h["y"].to_numpy()
        hid = h["id"].to_numpy(); hcore = h["core"].to_numpy()
        d2 = (hx[:, None] - ax[None, :]) ** 2 \
            + (hy[:, None] - ay[None, :]) ** 2
        near = d2 <= eps2
        rows = []
        # core-core edges, emitted by the smaller id's home cell
        ce = near & (hcore[:, None] == 1) & (acore[None, :] == 1) \
            & (hid[:, None] < aid[None, :])
        ii, jj = np.nonzero(ce)
        for i, j in zip(ii, jj):
            rows.append((0, int(hid[i]), int(aid[j])))
        # self-edge per home core (keeps isolated cores a component)
        for i in np.flatnonzero(hcore == 1):
            rows.append((0, int(hid[i]), int(hid[i])))
        # border anchors: home non-core with >= 1 core neighbor;
        # home non-core with NO core neighbor is noise — decidable
        # right here (its whole eps-ball is in this group)
        bn = near & (hcore[:, None] == 0) & (acore[None, :] == 1)
        has = bn.any(axis=1)
        for i in np.flatnonzero(has):
            anchor = int(aid[np.flatnonzero(bn[i])].min())
            rows.append((1, int(hid[i]), anchor))
        for i in np.flatnonzero((hcore == 0) & ~has):
            rows.append((2, int(hid[i]), -1))
        if not rows:
            return empty
        out = pd.DataFrame(rows, columns=["kind", "a", "b"])
        out["kind"] = out["kind"].astype(np.int8)
        return out

    ea = grouped_apply_bucketed(
        flagged.map_batches(_explode9(eps, ["core"]),
                            batch_format="pyarrow"),
        ["cell"], edges_anchors, num_buckets=num_buckets)

    def split(kind: int):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64())})
            import pyarrow.compute as pc
            return t.filter(pc.equal(t["kind"],
                                     pa.scalar(kind, pa.int8()))) \
                .select(["a", "b"])
        return fn

    core_edges = ea.map_batches(split(0), batch_format="pyarrow")
    borders = ea.map_batches(split(1), batch_format="pyarrow")

    comp = connected_components(core_edges, num_buckets=num_buckets)
    # comp: (node, comp) for cores. Borders need cluster(anchor):
    # one bucketed join on the anchor id.
    comp_rows = comp.map_batches(
        lambda t: pa.table({"kind": pa.array(
            np.zeros(t.num_rows, np.int8), pa.int8()),
            "id": t["node"], "ref": t["comp"]}),
        batch_format="pyarrow")
    border_rows = borders.map_batches(
        lambda t: pa.table({"kind": pa.array(
            np.ones(t.num_rows, np.int8), pa.int8()),
            "id": t["a"], "ref": t["b"]}),
        batch_format="pyarrow")

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # bucket key = ref for borders, id for cores? They must meet:
        # borders carry ref=anchor(core id); cores carry id=core id.
        empty = pd.DataFrame({"id": pd.Series([], dtype="int64"),
                              "cluster": pd.Series([], dtype="int64"),
                              "role": pd.Series([], dtype="int8")})
        if len(g) == 0:
            return empty
        cores = g[g["kind"] == 0]
        if len(cores) == 0:
            return empty
        cluster = int(cores["ref"].iloc[0])
        rows = [(int(i), cluster, np.int8(2))
                for i in cores["id"].to_numpy()]
        rows += [(int(i), cluster, np.int8(1))
                 for i in g[g["kind"] == 1]["id"].to_numpy()]
        out = pd.DataFrame(rows, columns=["id", "cluster", "role"])
        out["role"] = out["role"].astype(np.int8)
        return out

    # key the meet on the CORE id: cores by their own id, borders by
    # their anchor's id
    def add_key(t: pa.Table) -> pa.Table:
        kd = t["kind"].to_numpy(zero_copy_only=False)
        key = np.where(kd == 0,
                       t["id"].to_numpy(zero_copy_only=False),
                       t["ref"].to_numpy(zero_copy_only=False))
        return t.append_column("key", pa.array(key.astype(np.int64),
                                               pa.int64()))

    meet = comp_rows.union(border_rows).map_batches(
        add_key, batch_format="pyarrow")
    labeled = grouped_apply_bucketed(meet, ["key"], resolve,
                                     num_buckets=num_buckets)

    def tag_noise(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "role": pa.array([], pa.int8())})
        return pa.table({"id": t["a"],
                         "cluster": pa.array(
                             np.full(t.num_rows, -1, np.int64),
                             pa.int64()),
                         "role": pa.array(
                             np.zeros(t.num_rows, np.int8), pa.int8())})

    noise = ea.map_batches(split(2), batch_format="pyarrow") \
        .map_batches(tag_noise, batch_format="pyarrow")
    return labeled.union(noise)
