"""Distributed graph operators: connected components over an edge list.

The near-dup pipelines (minhash_lsh_pairs, ann.dup_pairs, edit1_pairs)
emit PAIRS; collapsing pairs into canonical duplicate CLUSTERS — pick
one representative per group — is a connected-components problem. The
reference has no graph step (its dedup is DuckDB DISTINCT,
load.py:212); this is part of the beyond-reference training-data
surface (SURVEY.md §2.9 extension family).

Algorithm: min-label propagation (the textbook Pregel/MapReduce CC):
every node starts labeled with itself; each round every node takes the
minimum label among itself and its neighbors; fixpoint after
``eccentricity(component)`` rounds.

Execution shape: this is THE case where raw Ray tasks beat the Dataset
API — an iterative fixpoint whose per-round work is tiny relative to a
Dataset execution's fixed cost (plan, actor wave, bucketed exchange).
Edges are hash-partitioned by source ONCE into ``num_buckets`` Arrow
tables pinned in the object store; labels live partitioned the same
way. A round is then exactly two task waves of ``num_buckets`` tiny
tasks each — join+scatter, then min-reduce — with the per-destination
pieces flowing task-to-task through the object store (a hand-rolled
shuffle that moves only slim (node, label) rows). Convergence is a
by-product of the min-reduce (count of labels that strictly
decreased), so no extra pass. The driver holds only object refs and a
per-round changed-counter; label tables never land on the driver — the
result is assembled with ``ray.data.from_arrow_refs``.

Dedup-cluster graphs have tiny diameter (pairs share a bucket key), so
rounds stay single-digit; from round 3 on, pointer-jumping shortcut
waves (label ← label(label), same scatter/min primitives keyed by the
label instead of the node) double the propagation distance per round,
so even high-diameter graphs (chains) converge in O(log n) rounds.
"""
from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _bucket_of(col: pa.ChunkedArray | pa.Array, B: int) -> np.ndarray:
    """Deterministic bucket id per value (int: splitmix64; str: crc32)."""
    from ..sources.synth import splitmix64

    if pa.types.is_integer(col.type):
        with np.errstate(over="ignore"):
            h = splitmix64(col.to_numpy().astype(np.uint64))
    else:
        h = np.array([zlib.crc32(str(v).encode()) for v in col.to_pylist()],
                     dtype=np.uint64)
    return (h % np.uint64(B)).astype(np.int64)


@ray.remote
def _peek_schema(tbl):
    return tbl.schema if isinstance(tbl, pa.Table) and tbl.num_rows else None


@ray.remote
def _split_edges(tbl, B: int, empty: pa.Table) -> tuple:
    """Partition a symmetrized edge block by hash(u) % B. Zero-row
    blocks reach here schema-less (Ray Data skips the map UDF for
    empty blocks and passes them through, sometimes still in pandas
    format) — normalize them to the canonical empty (u, v) table."""
    if not isinstance(tbl, pa.Table):
        tbl = pa.Table.from_pandas(tbl, preserve_index=False) \
            if len(tbl) else empty
    if tbl.num_rows == 0 or "u" not in tbl.column_names:
        return tuple(empty for _ in range(B))
    bk = _bucket_of(tbl["u"], B)
    return tuple(tbl.filter(pa.array(bk == i)) for i in range(B))


@ray.remote
def _build_bucket(*pieces: pa.Table) -> pa.Table:
    return pa.concat_tables([p for p in pieces if p.num_rows] or
                            [pieces[0]])


@ray.remote
def _init_labels(eb: pa.Table) -> pa.Table:
    u = pc_unique(eb["u"])
    return pa.table({"node": u, "lbl": u})


def pc_unique(col):
    import pyarrow.compute as pc

    return pc.unique(pa.chunked_array([col]) if isinstance(col, pa.Array)
                     else col)


@ray.remote
def _propagate(eb: pa.Table, lb: pa.Table, B: int) -> tuple:
    """Join edges (u,v) with labels on u; scatter (node=v, lbl) by
    hash(v) % B as one piece per destination bucket."""
    e = eb.select(["u", "v"]).to_pandas()
    l = lb.to_pandas()
    cand = e.merge(l, left_on="u", right_on="node")[["v", "lbl"]]
    out = pa.table({"node": pa.array(cand["v"].to_numpy(), eb.schema.field("v").type),
                    "lbl": pa.array(cand["lbl"].to_numpy(), lb.schema.field("lbl").type)})
    bk = _bucket_of(out["node"], B)
    return tuple(out.filter(pa.array(bk == i)) for i in range(B))


@ray.remote
def _min_reduce(old: pa.Table, *pieces: pa.Table) -> tuple:
    """New label per node = min(old label, incoming candidates);
    returns (labels table, number of labels that strictly decreased)."""
    cand = [p.to_pandas() for p in pieces if p.num_rows]
    o = old.to_pandas()
    if not cand:
        return old, 0
    cm = pd.concat(cand, ignore_index=True).groupby("node", sort=False)["lbl"].min()
    m = o.merge(cm.rename("__c"), left_on="node", right_index=True, how="left")
    take = m["__c"].notna() & (m["__c"] < m["lbl"])
    new_lbl = m["lbl"].where(~take, m["__c"])
    out = pa.table({"node": old["node"],
                    "lbl": pa.array(new_lbl.to_numpy(), old.schema.field("lbl").type)})
    return out, int(take.sum())


@ray.remote
def _ptr_request(lb: pa.Table, B: int) -> tuple:
    """Pointer-jumping wave A: ask each label's owner bucket for
    label(label) — scatter (q=lbl, node) by hash(lbl) % B."""
    bk = _bucket_of(lb["lbl"], B)
    t = pa.table({"q": lb["lbl"], "node": lb["node"]})
    return tuple(t.filter(pa.array(bk == i)) for i in range(B))


@ray.remote
def _ptr_answer(lb: pa.Table, B: int, *pieces: pa.Table) -> tuple:
    """Pointer-jumping wave B: answer label(q) from this bucket's
    labels; scatter (node, lbl(label)) back by hash(node) % B."""
    reqs = [p.to_pandas() for p in pieces if p.num_rows]
    node_t = lb.schema.field("node").type
    if not reqs:
        e = pa.table({"node": pa.array([], node_t),
                      "lbl": pa.array([], node_t)})
        return tuple(e for _ in range(B))
    r = pd.concat(reqs, ignore_index=True).merge(
        lb.to_pandas(), left_on="q", right_on="node",
        suffixes=("", "_owner"))
    out = pa.table({"node": pa.array(r["node"].to_numpy(), node_t),
                    "lbl": pa.array(r["lbl"].to_numpy(), node_t)})
    bk = _bucket_of(out["node"], B)
    return tuple(out.filter(pa.array(bk == i)) for i in range(B))


@ray.remote
def _finalize(lb: pa.Table) -> pa.Table:
    return lb.rename_columns(["node", "comp"])


def connected_components(edges: ray.data.Dataset, a: str = "a", b: str = "b",
                         max_rounds: int = 64,
                         num_buckets: int | None = None) -> ray.data.Dataset:
    """Connected components of the undirected graph given by edge
    columns (a, b). Returns a Dataset (node, comp) where ``comp`` is
    the minimum node id in the node's component (string or integer
    node ids — min is the column type's natural ordering, matching SQL
    MIN). Nodes appear iff they occur in at least one edge.
    """

    def sym(t: pa.Table) -> pa.Table:
        fwd = pa.table({"u": t[a], "v": t[b]})
        rev = pa.table({"u": t[b], "v": t[a]})
        return pa.concat_tables([fwd, rev])

    blocks = edges.map_batches(sym, batch_format="pyarrow").to_arrow_refs()
    if not blocks:
        empty = pa.table({"node": pa.array([], pa.string()),
                          "comp": pa.array([], pa.string())})
        return ray.data.from_arrow(empty)
    B = max(2, num_buckets or min(32, max(4, len(blocks))))
    # node type from the first non-empty computed block (schema-only
    # fetch — avoids re-executing the edge pipeline via ds.schema())
    schemas = ray.get([_peek_schema.remote(blk) for blk in blocks])
    node_type = next((s.field("u").type for s in schemas if s is not None),
                     None)
    if node_type is None:  # every block empty → no nodes
        e = pa.table({"node": pa.array([], pa.string()),
                      "comp": pa.array([], pa.string())})
        return ray.data.from_arrow(e)
    empty = pa.table({"u": pa.array([], node_type),
                      "v": pa.array([], node_type)})

    splits = [_split_edges.options(num_returns=B).remote(blk, B, empty)
              for blk in blocks]
    Eb = [_build_bucket.remote(*(s[i] for s in splits)) for i in range(B)]
    Lb = [_init_labels.remote(e) for e in Eb]

    for rnd in range(max_rounds):
        cands = [_propagate.options(num_returns=B).remote(Eb[i], Lb[i], B)
                 for i in range(B)]
        outs = [_min_reduce.options(num_returns=2).remote(
                    Lb[i], *(c[i] for c in cands)) for i in range(B)]
        Lb = [o[0] for o in outs]
        if sum(ray.get([o[1] for o in outs])) == 0:
            # edge fixpoint == neighbor-min fixpoint == component minima
            # (shortcutting cannot change a neighbor-min fixpoint)
            break
        if rnd >= 2:
            # pointer jumping (label ← label(label)): doubles the
            # effective propagation distance per round, so chains
            # converge in O(log n) rounds instead of O(diameter) —
            # skipped for the first rounds where dedup-cluster graphs
            # (tiny diameter) already finish
            reqs = [_ptr_request.options(num_returns=B).remote(Lb[i], B)
                    for i in range(B)]
            answ = [_ptr_answer.options(num_returns=B).remote(
                        Lb[j], B, *(r[j] for r in reqs)) for j in range(B)]
            outs = [_min_reduce.options(num_returns=2).remote(
                        Lb[i], *(a[i] for a in answ)) for i in range(B)]
            Lb = [o[0] for o in outs]
            ray.get([o[1] for o in outs])  # drain; convergence is edge-side
    else:
        raise RuntimeError(f"connected_components: no fixpoint in "
                           f"{max_rounds} rounds")

    return ray.data.from_arrow_refs([_finalize.remote(l) for l in Lb])


def canonical_reps(docs: ray.data.Dataset, pairs: ray.data.Dataset,
                   id_col: str = "doc_id", a: str = "id_a",
                   b: str = "id_b") -> ray.data.Dataset:
    """Near-dup canonicalization: collapse a pair list (from
    minhash_lsh_pairs / ann.dup_pairs / edit1_pairs) into clusters and
    assign every document its cluster representative — the minimum id
    in its connected component, itself if it appears in no pair. The
    output (id, rep_id) is the standard keep-mask for corpus dedup
    (keep iff id == rep_id).

    Scale shape: the component table is DUPLICATE-domain-sized (nodes
    that occur in at least one pair), which is a small fraction of the
    corpus in real dedup runs — it broadcasts once via ``ray.put`` and
    the corpus pass is map-only. If the dup domain ever rivals the
    corpus, swap the broadcast for ``relational.hash_join`` on id
    (same output contract)."""
    comp = connected_components(pairs, a=a, b=b)
    id_type = docs.schema().base_schema.field(id_col).type
    parts = list(comp.iter_batches(batch_format="pyarrow"))
    comp_tbl = pa.concat_tables(parts) if parts else \
        pa.table({"node": pa.array([], id_type),
                  "comp": pa.array([], id_type)})
    if comp_tbl.num_rows == 0:
        comp_tbl = pa.table({"node": pa.array([], id_type),
                             "comp": pa.array([], id_type)})
    # broadcast the node->comp table as a pandas frame ONCE — workers
    # deserialize it zero-conversion per batch (ADVICE r2)
    ref = ray.put(comp_tbl.to_pandas())

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        ids = t.column(id_col).to_pandas().rename(id_col)
        m = ids.to_frame().merge(c, left_on=id_col, right_on="node",
                                 how="left")
        rep = m["comp"].where(m["comp"].notna(), m[id_col])
        return pa.table({id_col: t[id_col],
                         "rep_id": pa.array(
                             rep.to_numpy(),
                             t.schema.field(id_col).type)})

    return docs.select_columns([id_col]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True)


def pagerank_int(edges: ray.data.Dataset, a: str = "u", b: str = "v",
                 iters: int = 3, total: int = 10 ** 9,
                 damping_pct: int = 85) -> pd.DataFrame:
    """Integer PageRank — the iterative graph benchmark made
    oracle-exact: ranks are integers out of ``total``; one iteration is
    r'(v) = ((100-dp)·total//100) // N + (dp · Σ_{u→v} r(u)//deg(u)) // 100
    with floor division everywhere, so engine and SQL replay the same
    integer recurrence (floats never appear; the usual PageRank is
    un-oracle-able float fixpoint drift).

    Shape: distinct edges + out-degrees computed once distributively;
    each iteration is ONE map-only pass over the edge Dataset with the
    node-domain rank table broadcast via ``ray.put`` (per-batch
    contribution partial sums, driver reduce). Web-scale graphs swap
    the broadcast for the connected-components bucket waves — same
    recurrence, noted here; the broadcast path assumes a node table
    that fits one machine (true for the dedup/e-commerce graphs this
    engine targets)."""
    from .. import relational as rel

    E = rel.distinct(edges.select_columns([a, b]), [a, b]).materialize()
    # degrees + node domain from ONE pull of the already-distinct edge
    # table — it is graph-domain-sized (not corpus-sized); at web scale
    # compute both with grouped_agg/distinct passes instead
    et = pa.concat_tables(E.iter_batches(batch_format="pyarrow")).to_pandas()
    deg = et.groupby(a).size().to_dict()
    nodes = np.sort(pd.concat([et[a], et[b]]).unique())
    N = len(nodes)
    if N == 0:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64")})
    rank = {int(n): total // N for n in nodes}
    base = ((100 - damping_pct) * total // 100) // N

    for _ in range(iters):
        contrib = {int(u): rank[int(u)] // int(d) for u, d in deg.items()}
        ref = ray.put(contrib)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            us = t[a].to_numpy()
            vs = t[b].to_numpy()
            w = np.array([c[int(u)] for u in us], dtype=np.int64)
            df = pd.DataFrame({"v": vs, "w": w}).groupby("v")["w"].sum()
            return pa.table({"node": pa.array(df.index.to_numpy(), pa.int64()),
                             "s": pa.array(df.to_numpy(), pa.int64())})

        parts = E.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
        s = parts.groupby("node")["s"].sum() if len(parts) else pd.Series(dtype="int64")
        rank = {int(n): base + (damping_pct * int(s.get(n, 0))) // 100
                for n in nodes}

    out = pd.DataFrame({"node": pd.Series(nodes, dtype="int64"),
                        "rank": pd.Series([rank[int(n)] for n in nodes],
                                          dtype="int64")})
    return out


def triangle_counts(edges: ray.data.Dataset, a: str = "u", b: str = "v"
                    ) -> pd.DataFrame:
    """Per-node triangle counts (the clustering-coefficient numerator).
    Edges are canonicalized u<v and deduped distributively; the
    adjacency (sorted neighbor array per node, CSR layout) broadcasts
    once via ``ray.put``; one map-only pass over the edge Dataset
    counts, for each edge (u,v), the common neighbors w>v
    (``np.intersect1d`` on the two sorted adjacency slices) and emits
    per-node increments — each triangle found exactly once at its
    smallest edge, charged to all three corners. Per-edge loop runs
    over graph-domain edges (not corpus rows); a corpus-sized graph
    would co-group by min-degree endpoint instead of broadcasting."""
    from .. import relational as rel

    def canon(t: pa.Table) -> pa.Table:
        uu = t[a].to_numpy()
        vv = t[b].to_numpy()
        lo = np.minimum(uu, vv)
        hi = np.maximum(uu, vv)
        keep = lo != hi
        return pa.table({"u": pa.array(lo[keep], pa.int64()),
                         "v": pa.array(hi[keep], pa.int64())})

    E = rel.distinct(edges.select_columns([a, b]).map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True),
        ["u", "v"]).materialize()
    et = pa.concat_tables(E.iter_batches(batch_format="pyarrow")).to_pandas()
    if not len(et):
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "n_tri": pd.Series(dtype="int64")})
    # undirected adjacency, neighbors sorted (CSR)
    sym = pd.concat([et, et.rename(columns={"u": "v", "v": "u"})])
    adj = {int(n): np.sort(g["v"].to_numpy())
           for n, g in sym.groupby("u", sort=False)}
    ref = ray.put(adj)

    def count(t: pa.Table) -> pa.Table:
        A = ray.get(ref)
        inc: dict[int, int] = {}
        for u, v in zip(t["u"].to_numpy(), t["v"].to_numpy()):
            w = np.intersect1d(A[int(u)], A[int(v)], assume_unique=True)
            w = w[w > v]  # u < v < w: count each triangle once
            if len(w):
                inc[int(u)] = inc.get(int(u), 0) + len(w)
                inc[int(v)] = inc.get(int(v), 0) + len(w)
                for x in w.tolist():
                    inc[int(x)] = inc.get(int(x), 0) + 1
        if not inc:
            return pa.table({"node": pa.array([], pa.int64()),
                             "n_tri": pa.array([], pa.int64())})
        return pa.table({"node": pa.array(list(inc), pa.int64()),
                         "n_tri": pa.array(list(inc.values()), pa.int64())})

    parts = E.map_batches(count, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    if not len(parts):
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "n_tri": pd.Series(dtype="int64")})
    out = parts.groupby("node", as_index=False)["n_tri"].sum()
    return out.sort_values("node").reset_index(drop=True) \
        .astype({"node": "int64", "n_tri": "int64"})


@ray.remote
def _init_hops(eb: pa.Table, seed_ref, inf: int) -> pa.Table:
    u = pc_unique(eb["u"])
    un = u.to_numpy(zero_copy_only=False)
    seeds = seed_ref
    lbl = np.where(np.isin(un, seeds), 0, inf).astype(np.int64)
    return pa.table({"node": u, "lbl": pa.array(lbl, pa.int64())})


@ray.remote
def _propagate_hops(eb: pa.Table, lb: pa.Table, B: int,
                    inf: int) -> tuple:
    """BFS relax wave: candidates dist(v) = dist(u) + 1 for settled
    u (dist < inf), scattered by hash(v) % B."""
    e = eb.select(["u", "v"]).to_pandas()
    l = lb.to_pandas()
    l = l[l["lbl"] < inf]
    cand = e.merge(l, left_on="u", right_on="node")[["v", "lbl"]]
    out = pa.table({"node": pa.array(cand["v"].to_numpy(),
                                     eb.schema.field("v").type),
                    "lbl": pa.array(cand["lbl"].to_numpy() + 1,
                                    pa.int64())})
    bk = _bucket_of(out["node"], B)
    return tuple(out.filter(pa.array(bk == i)) for i in range(B))


@ray.remote
def _finalize_hops(lb: pa.Table, inf: int) -> pa.Table:
    keep = pc.less(lb["lbl"], pa.scalar(inf, pa.int64()))
    t = lb.filter(keep)
    return pa.table({"node": t["node"], "hops": t["lbl"]})


def bfs_hops(edges: ray.data.Dataset, seeds: "np.ndarray",
             a: str = "a", b: str = "b", max_rounds: int = 64,
             num_buckets: int | None = None) -> ray.data.Dataset:
    """Multi-source BFS hop distance over an undirected edge list:
    every node reachable from any seed gets its minimum hop count
    (seeds = 0). Unreachable nodes are omitted — output scales with
    the reachable set.

    Same raw-task wave shape as :func:`connected_components` (edges
    partitioned ONCE by hash(u), two gather/scatter waves per round,
    labels never on the driver) — hop metric means no pointer jumping
    (dist(label(label)) is not dist+hops), so rounds = eccentricity of
    the seed set, the BFS lower bound. Convergence = a round with no
    label decrease. SQL parity: a recursive CTE (the q187 oracle).
    """
    INF = np.iinfo(np.int64).max // 2

    def sym(t: pa.Table) -> pa.Table:
        fwd = pa.table({"u": t[a], "v": t[b]})
        rev = pa.table({"u": t[b], "v": t[a]})
        return pa.concat_tables([fwd, rev])

    blocks = edges.map_batches(sym, batch_format="pyarrow").to_arrow_refs()
    empty_out = pa.table({"node": pa.array([], pa.int64()),
                          "hops": pa.array([], pa.int64())})
    if not blocks:
        return ray.data.from_arrow(empty_out)
    B = max(2, num_buckets or min(32, max(4, len(blocks))))
    schemas = ray.get([_peek_schema.remote(blk) for blk in blocks])
    node_type = next((s.field("u").type for s in schemas
                      if s is not None), None)
    if node_type is None:
        return ray.data.from_arrow(empty_out)
    empty = pa.table({"u": pa.array([], node_type),
                      "v": pa.array([], node_type)})
    seed_ref = ray.put(np.asarray(seeds))
    splits = [_split_edges.options(num_returns=B).remote(blk, B, empty)
              for blk in blocks]
    Eb = [_build_bucket.remote(*(s[i] for s in splits)) for i in range(B)]
    Lb = [_init_hops.remote(e, seed_ref, INF) for e in Eb]

    for _ in range(max_rounds):
        cands = [_propagate_hops.options(num_returns=B).remote(
                     Eb[i], Lb[i], B, INF) for i in range(B)]
        outs = [_min_reduce.options(num_returns=2).remote(
                    Lb[i], *(c[i] for c in cands)) for i in range(B)]
        Lb = [o[0] for o in outs]
        if sum(ray.get([o[1] for o in outs])) == 0:
            break
    else:
        raise RuntimeError(f"bfs_hops: no fixpoint in {max_rounds} rounds")

    return ray.data.from_arrow_refs(
        [_finalize_hops.remote(l, INF) for l in Lb])


@ray.remote
def _kcore_dedup(eb: pa.Table) -> pa.Table:
    """Simple-graph normalization per bucket: drop self-loops and
    duplicate (u, v) rows (degree = distinct-neighbor count)."""
    if eb.num_rows == 0:
        return eb
    u = eb["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = eb["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = u != v
    u, v = u[m], v[m]
    packed = np.unique(np.stack([u, v], axis=1), axis=0)
    return pa.table({"u": pa.array(packed[:, 0], eb.schema.field("u").type),
                     "v": pa.array(packed[:, 1], eb.schema.field("v").type)})


@ray.remote(num_returns=2)
def _kcore_dead(eb: pa.Table, k: int) -> tuple:
    """Nodes of this bucket whose current degree < k."""
    if eb.num_rows == 0:
        return np.empty(0, np.int64), 0
    u = eb["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, cnt = np.unique(u, return_counts=True)
    dead = uniq[cnt < k]
    return dead, len(dead)


@ray.remote
def _kcore_filter(eb: pa.Table, *dead_all) -> pa.Table:
    """Drop every edge incident to a dead node (either endpoint)."""
    if eb.num_rows == 0:
        return eb
    dead = np.sort(np.concatenate([d for d in dead_all]))
    if len(dead) == 0:
        return eb
    u = eb["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = eb["v"].to_numpy(zero_copy_only=False).astype(np.int64)

    def hit(x):
        i = np.searchsorted(dead, x)
        i = np.minimum(i, len(dead) - 1)
        return dead[i] == x

    return eb.filter(pa.array(~(hit(u) | hit(v))))


@ray.remote
def _kcore_emit(eb: pa.Table) -> pa.Table:
    if eb.num_rows == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "deg": pa.array([], pa.int64())})
    u = eb["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, cnt = np.unique(u, return_counts=True)
    return pa.table({"node": pa.array(uniq, pa.int64()),
                     "deg": pa.array(cnt, pa.int64())})


def kcore(edges: ray.data.Dataset, k: int, a: str = "a", b: str = "b",
          num_buckets: int | None = None, max_rounds: int = 10000
          ) -> ray.data.Dataset:
    """k-core decomposition by distributed peeling: repeatedly delete
    every node whose degree (distinct neighbors, self-loops ignored)
    is < k until none remains; returns the surviving subgraph's nodes
    with their FINAL degrees — Dataset[(node, deg)], empty if the
    graph has no k-core.

    Same raw-task bucket shape as connected_components: edges
    symmetrize and partition ONCE by hash(u) (so each node's whole
    adjacency is bucket-local and degree needs no communication); a
    round is one dead-node scan per bucket plus one filter per bucket
    that takes every bucket's (small) dead list — per-round traffic is
    O(#newly-dead), not O(edges). Rounds ≤ peeling depth; convergence
    = a round with zero deaths. The degeneracy-ordering use (core
    numbers for ALL k) is a loop over k reusing the surviving state.
    """
    def sym(t: pa.Table) -> pa.Table:
        fwd = pa.table({"u": t[a], "v": t[b]})
        rev = pa.table({"u": t[b], "v": t[a]})
        return pa.concat_tables([fwd, rev])

    blocks = edges.map_batches(sym, batch_format="pyarrow").to_arrow_refs()
    empty_out = pa.table({"node": pa.array([], pa.int64()),
                          "deg": pa.array([], pa.int64())})
    if not blocks:
        return ray.data.from_arrow(empty_out)
    B = max(2, num_buckets or min(32, max(4, len(blocks))))
    schemas = ray.get([_peek_schema.remote(blk) for blk in blocks])
    node_type = next((s.field("u").type for s in schemas
                      if s is not None), None)
    if node_type is None:
        return ray.data.from_arrow(empty_out)
    empty = pa.table({"u": pa.array([], node_type),
                      "v": pa.array([], node_type)})
    splits = [_split_edges.options(num_returns=B).remote(blk, B, empty)
              for blk in blocks]
    Eb = [_kcore_dedup.remote(_build_bucket.remote(*(s[i] for s in splits)))
          for i in range(B)]

    for _ in range(max_rounds):
        outs = [_kcore_dead.remote(e, k) for e in Eb]
        deads = [o[0] for o in outs]
        if sum(ray.get([o[1] for o in outs])) == 0:
            break
        Eb = [_kcore_filter.remote(Eb[i], *deads) for i in range(B)]
    else:
        raise RuntimeError(f"kcore: no fixpoint in {max_rounds} rounds")

    return ray.data.from_arrow_refs([_kcore_emit.remote(e) for e in Eb])


def copair_counts(edges: ray.data.Dataset, u: str = "u", w: str = "w",
                  num_buckets: int = 64) -> ray.data.Dataset:
    """Bipartite co-occurrence / butterfly counting: for every pair of
    left nodes (u1 < u2) sharing ≥ 2 right neighbors, the common-
    neighbor count c and the butterfly (4-cycle) count C(c, 2) —
    the co-citation / user-item-overlap metric of bipartite graphs.

    Two slim shuffles: (1) edges group on the RIGHT key; each group
    emits its C(deg, 2) left-pairs (the wedge explode — bound the hub
    degree upstream or salt, SURVEY §4); (2) pairs group on (u1, u2)
    and count. Input multi-edges are deduped inside the first group.
    Returns Dataset[(u1, u2, c, bf)] with c ≥ 2.
    """
    from ..relational import grouped_apply_bucketed

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        ls = np.unique(g[u].to_numpy().astype(np.int64))
        n = len(ls)
        if n < 2:
            return pd.DataFrame({"u1": pd.Series([], dtype="int64"),
                                 "u2": pd.Series([], dtype="int64")})
        ii, jj = np.triu_indices(n, k=1)
        return pd.DataFrame({"u1": ls[ii], "u2": ls[jj]})

    pairs = grouped_apply_bucketed(edges, [w], wedges,
                                   num_buckets=num_buckets)

    def count(g: pd.DataFrame) -> pd.DataFrame:
        c = len(g)
        if c < 2:
            return pd.DataFrame({"u1": pd.Series([], dtype="int64"),
                                 "u2": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64"),
                                 "bf": pd.Series([], dtype="int64")})
        return pd.DataFrame({"u1": [int(g["u1"].iloc[0])],
                             "u2": [int(g["u2"].iloc[0])],
                             "c": [c], "bf": [c * (c - 1) // 2]})

    return grouped_apply_bucketed(pairs, ["u1", "u2"], count,
                                  num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# Forest ranking: depth + root per node via distributed pointer doubling
# (the classic parallel list-ranking primitive generalized to forests).


@ray.remote
def _rank_init(nb: pa.Table) -> pa.Table:
    """State per node: (node, anc, d, done). Non-roots start pointing
    one step up (anc=parent, d=1); roots are born finished
    (anc=node, d=0)."""
    node = nb["node"].to_numpy()
    par = nb["parent"].to_numpy()
    root = par <= 0
    anc = np.where(root, node, par)
    d = np.where(root, 0, 1).astype(np.int64)
    return pa.table({"node": pa.array(node, pa.int64()),
                     "anc": pa.array(anc, pa.int64()),
                     "d": pa.array(d, pa.int64()),
                     "done": pa.array(root)})


@ray.remote
def _rank_request(sb: pa.Table, B: int) -> tuple:
    """Wave A: every unfinished node asks its ancestor's owner bucket
    for that ancestor's (anc, d, done) — scatter (q=anc, node, d) by
    hash(anc) % B. Finished nodes ask nothing."""
    live = sb.filter(pc.invert(sb["done"]))
    t = pa.table({"q": live["anc"], "node": live["node"], "d": live["d"]})
    bk = _bucket_of(t["q"], B) if t.num_rows else np.empty(0, np.int64)
    return tuple(t.filter(pa.array(bk == i)) for i in range(B))


@ray.remote
def _rank_answer(sb: pa.Table, B: int, *pieces: pa.Table) -> tuple:
    """Wave B: answer each request from this bucket's state — the new
    ancestor doubles the jump: (node, anc←anc.anc, d←d+anc.d,
    done←anc.done); scatter back by hash(node) % B."""
    reqs = [p.to_pandas() for p in pieces if p.num_rows]
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "anc": pa.array([], pa.int64()),
                      "d": pa.array([], pa.int64()),
                      "done": pa.array([], pa.bool_())})
    if not reqs:
        return tuple(empty for _ in range(B))
    r = pd.concat(reqs, ignore_index=True).merge(
        sb.to_pandas(), left_on="q", right_on="node",
        suffixes=("", "_a"))
    out = pa.table({"node": pa.array(r["node"].to_numpy(), pa.int64()),
                    "anc": pa.array(r["anc"].to_numpy(), pa.int64()),
                    "d": pa.array((r["d"] + r["d_a"]).to_numpy(), pa.int64()),
                    "done": pa.array(r["done"].to_numpy(), pa.bool_())})
    bk = _bucket_of(out["node"], B)
    return tuple(out.filter(pa.array(bk == i)) for i in range(B))


@ray.remote
def _rank_apply(old: pa.Table, *pieces: pa.Table) -> tuple:
    """Overwrite each answered node's state; returns (state, number of
    nodes still unfinished)."""
    ans = [p.to_pandas() for p in pieces if p.num_rows]
    o = old.to_pandas()
    if ans:
        a = pd.concat(ans, ignore_index=True).set_index("node")
        m = o["node"].map(a["anc"])
        hit = m.notna().to_numpy()
        anc = o["anc"].to_numpy().copy()
        d = o["d"].to_numpy().copy()
        done = o["done"].to_numpy().copy()
        anc[hit] = m[hit].to_numpy().astype(np.int64)
        d[hit] = o["node"].map(a["d"])[hit].to_numpy().astype(np.int64)
        done[hit] = o["node"].map(a["done"])[hit].to_numpy().astype(bool)
        o = pd.DataFrame({"node": o["node"], "anc": anc, "d": d,
                          "done": done})
    left = int((~o["done"]).sum())
    return pa.Table.from_pandas(o, preserve_index=False), left


@ray.remote
def _rank_final(sb: pa.Table) -> pa.Table:
    return pa.table({"node": sb["node"], "root": sb["anc"],
                     "depth": sb["d"]})


def forest_rank(nodes: ray.data.Dataset, node: str = "node",
                parent: str = "parent", max_rounds: int = 64,
                num_buckets: int | None = None) -> ray.data.Dataset:
    """Depth and root id for every node of a forest given as
    (node, parent) rows — parent ≤ 0 marks a root. Distributed
    pointer doubling (parallel list ranking): after round t every
    node's pointer has jumped 2^t ancestors (or landed on its root),
    so a forest of depth D finishes in ceil(log2 D)+1 rounds — two
    slim task waves per round over hash(node)-partitioned state, the
    state never on the driver (the exact shape of
    connected_components' shortcut waves, with the jump distance
    accumulated so depth comes out exact).

    Reference parity: none (no hierarchy ops in the reference); this
    is the recursive-CTE flattening (org charts, river networks,
    thread trees) every warehouse needs, in O(log D) rounds instead
    of D dependent scans. Oracle: a recursive CTE (q236)."""
    def norm(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pc.cast(t[node], pa.int64()),
            "parent": pc.cast(t[parent], pa.int64())})

    blocks = nodes.map_batches(norm, batch_format="pyarrow") \
        .to_arrow_refs()
    empty_out = pa.table({"node": pa.array([], pa.int64()),
                          "root": pa.array([], pa.int64()),
                          "depth": pa.array([], pa.int64())})
    if not blocks:
        return ray.data.from_arrow(empty_out)
    B = max(2, num_buckets or min(32, max(4, len(blocks))))
    empty = pa.table({"u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64())})

    @ray.remote
    def split(blk, B):
        t = blk if isinstance(blk, pa.Table) else \
            pa.Table.from_pandas(blk, preserve_index=False)
        if t.num_rows == 0 or "node" not in t.column_names:
            e = pa.table({"node": pa.array([], pa.int64()),
                          "parent": pa.array([], pa.int64())})
            return tuple(e for _ in range(B))
        bk = _bucket_of(t["node"], B)
        return tuple(t.filter(pa.array(bk == i)) for i in range(B))

    splits = [split.options(num_returns=B).remote(blk, B)
              for blk in blocks]
    Nb = [_build_bucket.remote(*(s[i] for s in splits)) for i in range(B)]
    Sb = [_rank_init.remote(n) for n in Nb]

    for _ in range(max_rounds):
        reqs = [_rank_request.options(num_returns=B).remote(Sb[i], B)
                for i in range(B)]
        answ = [_rank_answer.options(num_returns=B).remote(
                    Sb[i], B, *(r[i] for r in reqs)) for i in range(B)]
        outs = [_rank_apply.options(num_returns=2).remote(
                    Sb[i], *(a[i] for a in answ)) for i in range(B)]
        Sb = [o[0] for o in outs]
        if sum(ray.get([o[1] for o in outs])) == 0:
            break
    else:
        raise RuntimeError(f"forest_rank: no fixpoint in {max_rounds} rounds")
    return ray.data.from_arrow_refs([_rank_final.remote(s) for s in Sb])


# ---------------------------------------------------------------------------
# Hop-bounded cheapest path: L min-plus relaxation rounds (distributed
# Bellman–Ford) from a broadcast seed set over a DIRECTED weighted
# edge list.


@ray.remote
def _relax(eb: pa.Table, lb: pa.Table, B: int, inf: int) -> tuple:
    """Min-plus relax wave: candidates dist(v) = dist(u) + w(u,v) for
    settled u, scattered by hash(v) % B."""
    e = eb.select(["u", "v", "w"]).to_pandas()
    l = lb.to_pandas()
    l = l[l["lbl"] < inf]
    cand = e.merge(l, left_on="u", right_on="node")
    out = pa.table({"node": pa.array(cand["v"].to_numpy(), pa.int64()),
                    "lbl": pa.array((cand["lbl"] + cand["w"]).to_numpy(),
                                    pa.int64())})
    bk = _bucket_of(out["node"], B)
    return tuple(out.filter(pa.array(bk == i)) for i in range(B))


def cheapest_hops(edges: ray.data.Dataset, seeds: "np.ndarray",
                  hops: int, u: str = "u", v: str = "v", w: str = "w",
                  num_buckets: int | None = None) -> ray.data.Dataset:
    """Cheapest cost to reach each node from any seed using at most
    ``hops`` edges — distributed Bellman–Ford cut at a hop budget (the
    form whose SQL oracle is ``hops`` chained self-joins, and the
    building block of delta-stepping-style SSSP). Directed edges with
    nonnegative int64 weights; nodes unreachable within the budget are
    omitted.

    Same raw-task wave shape as :func:`bfs_hops` (edges partitioned
    ONCE by hash(u), one relax + one min-reduce wave per round, labels
    never on the driver), but each round relaxes dist(v) = min(dist(v),
    dist(u) + w) instead of +1, and the loop runs EXACTLY ``hops``
    rounds (early-exits only when a round changes nothing — then the
    budget is already slack). Per-round traffic is slim (node, cand)
    rows; parallel multi-edges need no pre-dedup (min-reduce absorbs
    them)."""
    INF = np.iinfo(np.int64).max // 4

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({"u": pc.cast(t[u], pa.int64()),
                         "v": pc.cast(t[v], pa.int64()),
                         "w": pc.cast(t[w], pa.int64())})

    blocks = edges.map_batches(norm, batch_format="pyarrow").to_arrow_refs()
    empty_out = pa.table({"node": pa.array([], pa.int64()),
                          "cost": pa.array([], pa.int64())})
    if not blocks:
        return ray.data.from_arrow(empty_out)
    B = max(2, num_buckets or min(32, max(4, len(blocks))))
    empty = pa.table({"u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64()),
                      "w": pa.array([], pa.int64())})

    @ray.remote
    def split(blk, B):
        t = blk if isinstance(blk, pa.Table) else \
            pa.Table.from_pandas(blk, preserve_index=False)
        if t.num_rows == 0 or "u" not in t.column_names:
            return tuple(empty for _ in range(B))
        bk = _bucket_of(t["u"], B)
        return tuple(t.filter(pa.array(bk == i)) for i in range(B))

    @ray.remote
    def init_nodes(eb: pa.Table, seed_ref, inf: int) -> pa.Table:
        nodes = pc_unique(pa.chunked_array([eb["u"].combine_chunks(),
                                            eb["v"].combine_chunks()]))
        un = nodes.to_numpy(zero_copy_only=False)
        lbl = np.where(np.isin(un, seed_ref), 0, inf).astype(np.int64)
        return pa.table({"node": nodes, "lbl": pa.array(lbl, pa.int64())})

    @ray.remote
    def own(lb: pa.Table, i: int, B: int) -> pa.Table:
        bk = _bucket_of(lb["node"], B)
        return lb.filter(pa.array(bk == i))

    seed_ref = ray.put(np.asarray(seeds))
    splits = [split.options(num_returns=B).remote(blk, B) for blk in blocks]
    Eb = [_build_bucket.remote(*(s[i] for s in splits)) for i in range(B)]
    # label bucket i owns hash(node)%B == i, seeded from BOTH edge
    # endpoints so sinks (v-only nodes) are rankable
    nb = [init_nodes.remote(e, seed_ref, INF) for e in Eb]
    Lb = [_min_reduce.options(num_returns=2).remote(
              _build_bucket.remote(*[own.remote(n, i, B) for n in nb]),
              pa.table({"node": pa.array([], pa.int64()),
                        "lbl": pa.array([], pa.int64())}))
          for i in range(B)]
    Lb = [l[0] for l in Lb]
    # dedupe node rows inside each owner bucket (a node appears once
    # per edge bucket that touches it)
    @ray.remote
    def dedupe(lb: pa.Table) -> pa.Table:
        df = lb.to_pandas().groupby("node", as_index=False)["lbl"].min()
        return pa.Table.from_pandas(df, preserve_index=False)

    Lb = [dedupe.remote(l) for l in Lb]

    # relax needs dist(u) co-located with edges bucketed by hash(u) —
    # the owner partitioning IS that partitioning, so Lb serves both.
    for _ in range(hops):
        cands = [_relax.options(num_returns=B).remote(Eb[i], Lb[i], B, INF)
                 for i in range(B)]
        outs = [_min_reduce.options(num_returns=2).remote(
                    Lb[i], *(c[i] for c in cands)) for i in range(B)]
        Lb = [o[0] for o in outs]
        if sum(ray.get([o[1] for o in outs])) == 0:
            break

    @ray.remote
    def final(lb: pa.Table, inf: int) -> pa.Table:
        t = lb.filter(pc.less(lb["lbl"], pa.scalar(inf, pa.int64())))
        return pa.table({"node": t["node"], "cost": t["lbl"]})

    return ray.data.from_arrow_refs([final.remote(l, INF) for l in Lb])


def reciprocity(edges: ray.data.Dataset, u: str = "u", v: str = "v",
                num_buckets: int = 64) -> "pd.DataFrame":
    """Directed-graph reciprocity: of the distinct directed edges
    (self-loops excluded), how many have their reverse present —
    each edge folds to its UNDIRECTED key with an orientation bit,
    one hash-bucket shuffle, and a per-pair OR tells whether one or
    both directions exist; the fold result is 3 counters, never the
    edge list, on the driver. Returns one row
    (n_directed, n_undirected, n_reciprocal)."""
    from ..relational import grouped_apply_bucketed

    def canon(t: pa.Table) -> pa.Table:
        a = pc.cast(t[u], pa.int64()).to_numpy()
        b = pc.cast(t[v], pa.int64()).to_numpy()
        keep = a != b
        a, b = a[keep], b[keep]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pa.table({
            "pk": pa.array(lo * (1 << 31) + hi, pa.int64()),
            "fwd": pa.array((a < b).astype(np.int64), pa.int64()),
            "rev": pa.array((a > b).astype(np.int64), pa.int64())})

    keyed = edges.map_batches(canon, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("pk").agg(fwd=("fwd", "max"),
                                  rev=("rev", "max"))
        both = int((agg["fwd"] & agg["rev"]).sum())
        ndir = int(agg["fwd"].sum() + agg["rev"].sum())
        return pd.DataFrame({"n_directed": [ndir],
                             "n_undirected": [len(agg)],
                             "n_reciprocal": [both]})

    parts = grouped_apply_bucketed(keyed, ["pk"], fold,
                                   num_buckets=num_buckets,
                                   whole_bucket=True).to_pandas()
    out = parts.sum().to_frame().T.astype("int64")
    return out.reset_index(drop=True)


def dag_layers(edges: ray.data.Dataset, u: str = "u", v: str = "v",
               max_rounds: int = 32) -> ray.data.Dataset:
    """Longest-path layering of a DAG: layer(x) = length (in edges) of
    the longest path ending at x — the critical-path depth used to
    schedule dependency graphs (build systems, feature DAGs) into
    parallel waves.

    Algorithm: wave relaxation. Round r broadcasts the current layer
    table and streams the EDGES (the big side) through ``map_batches``,
    emitting per-batch (v, layer(u)+1) max-partials; a tiny grouped max
    merges them and raises layers. Converges in depth(G) rounds; each
    round is one map over edges plus a |V|-sized reduce — edges never
    shuffle and never leave their blocks.

    Partitioning assumption (documented per the custom-operator rule):
    the layer table is the SMALL side (|V| bounded — here the node-id
    domain; at 100 TB a layer table of billions of nodes would move to
    a hash-partitioned join per wave instead of a broadcast). Rounds
    are bounded by ``max_rounds`` and stop at the first fixpoint.
    """
    from .. import relational as rel

    e = rel.distinct(edges.select_columns([u, v]), [u, v])
    nodes = rel.distinct(
        e.map_batches(lambda t: pa.table(
            {"node": pa.concat_arrays([
                t[u].combine_chunks().cast(pa.int64()),
                t[v].combine_chunks().cast(pa.int64())])}),
            batch_format="pyarrow"),
        ["node"]).to_pandas()
    if "node" not in nodes.columns or not len(nodes):  # empty graph
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "layer": pa.array([], pa.int64())}))
    nodes = np.sort(nodes["node"].to_numpy().astype(np.int64))
    layer = np.zeros(len(nodes), np.int64)

    for _ in range(max_rounds):
        ref = ray.put((nodes, layer))

        def relax(t: pa.Table) -> pa.Table:
            nd, ly = ray.get(ref)
            uu = t[u].to_numpy(zero_copy_only=False).astype(np.int64)
            vv = t[v].to_numpy(zero_copy_only=False).astype(np.int64)
            cand = ly[np.searchsorted(nd, uu)] + 1
            f = pd.DataFrame({"node": vv, "cand": cand})
            g = f.groupby("node", sort=False, as_index=False)["cand"].max()
            return pa.table({"node": pa.array(g["node"], pa.int64()),
                             "cand": pa.array(g["cand"], pa.int64())})

        got = rel.grouped_agg(
            e.map_batches(relax, batch_format="pyarrow"),
            ["node"], max_cols=["cand"], count=False).to_pandas()
        new = layer.copy()
        idx = np.searchsorted(nodes, got["node"].to_numpy())
        np.maximum.at(new, idx, got["max_cand"].to_numpy())
        if np.array_equal(new, layer):
            break
        layer = new

    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "layer": pa.array(layer, pa.int64())}))


def bipartite_check(edges: ray.data.Dataset, a: str = "u",
                    b: str = "v") -> ray.data.Dataset:
    """Per-component bipartiteness: compose the engine's distributed
    CC (min-label waves) with multi-source BFS from each component's
    root (its min node); a component is bipartite iff NO edge joins
    two nodes of equal BFS-layer parity (an equal-parity edge closes
    an odd cycle). Emits (comp, n_nodes, is_bipartite).

    Scale shape: CC and BFS are the existing raw-task wave operators
    (edges partitioned once, labels never on the driver); the final
    parity audit broadcasts the (node → comp, parity) table — the
    SMALL side, |V|-bounded like dag_layers — and streams the edges
    through one map_batches."""
    from .. import relational as rel

    cc = connected_components(edges, a=a, b=b).to_pandas()
    roots = np.unique(cc["comp"].to_numpy().astype(np.int64))
    dist = bfs_hops(edges, roots, a=a, b=b).to_pandas()
    node = dist["node"].to_numpy().astype(np.int64)
    order = np.argsort(node)
    node = node[order]
    par = (dist["hops"].to_numpy().astype(np.int64) % 2)[order]
    comp_map = cc.set_index("node")["comp"]
    comp_of = comp_map.reindex(node).to_numpy().astype(np.int64)
    ref = ray.put((node, par, comp_of))

    def audit(t: pa.Table) -> pa.Table:
        nd, pr, cp = ray.get(ref)
        uu = t[a].to_numpy(zero_copy_only=False).astype(np.int64)
        vv = t[b].to_numpy(zero_copy_only=False).astype(np.int64)
        pu = pr[np.searchsorted(nd, uu)]
        pv = pr[np.searchsorted(nd, vv)]
        cu = cp[np.searchsorted(nd, uu)]
        bad = pu == pv
        u2, c2 = np.unique(cu[bad], return_counts=True)
        return pa.table({"comp": pa.array(u2, pa.int64()),
                         "n_bad": pa.array(c2, pa.int64())})

    bad = rel.grouped_agg(
        edges.map_batches(audit, batch_format="pyarrow"),
        ["comp"], sum_cols=["n_bad"], count=False).to_pandas()
    if "n_bad" not in bad.columns:  # all-empty result drops columns
        bad_set: set = set()
    else:
        bad_set = set(bad.loc[bad["n_bad"] > 0, "comp"].astype(int))
    sizes = cc.groupby("comp", sort=True).size()
    return ray.data.from_arrow(pa.table({
        "comp": pa.array(sizes.index.to_numpy().astype(np.int64),
                         pa.int64()),
        "n_nodes": pa.array(sizes.to_numpy().astype(np.int64), pa.int64()),
        "is_bipartite": pa.array(
            [0 if int(c) in bad_set else 1 for c in sizes.index],
            pa.int64())}))
