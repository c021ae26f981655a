"""knn_graph route benchmark at scale (VERDICT r4 item 1 evidence).

Times the dense-broadcast route vs the IVF-partitioned route (exact,
nprobe=all) on a synthetic embedding corpus big enough that per-list
chunking matters, and checks output parity. Also times an approximate
nprobe to show the opt-in trade.

    python tools/knn_ivf_bench.py [n_vectors] [dim]   # default 200k x 64

Prints ONE JSON line (append to CAMPAIGN_r5.jsonl). Deterministic
corpus: rows are a pure hash of vec_id.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

import ray
import ray.data

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
CORPUS = f"/dev/shm/graft_knn_corpus_{N}_{DIM}"


def _gen(t: pa.Table) -> pa.Table:
    ids = t.column("id").to_numpy().astype(np.int64)
    with np.errstate(over="ignore"):
        w = (ids[:, None].astype(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)
             + np.arange(DIM, dtype=np.uint64)[None, :]
             * np.uint64(0xBF58476D1CE4E5B9))
        w ^= w >> np.uint64(31)
    m = (w % np.uint64(1 << 20)).astype(np.float64) / float(1 << 20) - 0.5
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "embedding": pa.array([r.tolist() for r in m],
                                           pa.list_(pa.float64()))})


def main():
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    from hand_index_ray.pipelines.ann import knn_graph

    if not os.path.isdir(CORPUS) or not os.listdir(CORPUS):
        (ray.data.range(N).map_batches(_gen, batch_format="pyarrow")
         .write_parquet(CORPUS))

    out = {}
    counts = {}
    checks = {}
    for name, kw in (
        ("dense_broadcast", {}),
        ("ivf_exact", {"broadcast_bytes": 0, "nlist": 16}),
        ("ivf_nprobe4", {"broadcast_bytes": 0, "nlist": 16, "nprobe": 4}),
    ):
        ds = ray.data.read_parquet(CORPUS)
        t0 = time.perf_counter()
        res = knn_graph(ds, k=3, **kw)
        # consume without landing the edge list on the driver, but keep
        # a driver-side checksum for the parity check
        tot_rows = 0
        acc = np.uint64(0)
        for b in res.iter_batches(batch_format="pyarrow"):
            if b.num_rows == 0:
                continue
            tot_rows += b.num_rows
            with np.errstate(over="ignore"):
                # per-ROW hash, wrap-SUM across rows: commutative and
                # batching-independent, so both routes' arbitrary block
                # orders produce the same checksum iff the row sets match
                hv = ((b.column("src").to_numpy().astype(np.uint64)
                       * np.uint64(1_000_003)
                       + b.column("rank").to_numpy().astype(np.uint64)
                       * np.uint64(10_007)
                       + b.column("dst").to_numpy().astype(np.uint64))
                      * np.uint64(31)
                      ^ b.column("sim_micro").to_numpy().astype(np.uint64))
                acc = acc + np.add.reduce(hv)
        out[f"{name}_sec"] = round(time.perf_counter() - t0, 2)
        counts[name] = tot_rows
        checks[name] = int(acc)

    line = {
        "step": f"r5_knn_graph_routes_{N // 1000}k_x{DIM}",
        "vectors": N, "dim": DIM,
        **out,
        "rows": counts,
        "exact_parity": bool(checks["dense_broadcast"] == checks["ivf_exact"]
                             and counts["dense_broadcast"] == counts["ivf_exact"]),
        "note": ("IVF route at forced threshold: exact (all lists probed) "
                 "parity vs dense broadcast, plus the nprobe=4 approximate "
                 "trade; no driver-side corpus concat on either route"),
    }
    print(json.dumps(line))
    ray.shutdown()
    if not line["exact_parity"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
